"""O27 — the periodic heartbeat runner.

`sources.postgres.heartbeat_tick_sql` builds the WAL-advancing write; this
runner executes it on the reference's schedule (`pq/heartbeat/heartbeat.go:
96-171`: a ticker loop with jittered interval, failures logged-and-retried,
stopped via context cancel). The heartbeat matters on quiet databases: with
no captured-table traffic the slot's restart_lsn never moves and the server
retains WAL without bound; a periodic write to the captured heartbeat table
generates WAL the pipeline consumes and acks.

`SlotKeeper.keepalive_once` embeds the same tick for the polling transport;
this standalone runner covers deployments where the transport is external
(Kafka/Debezium-style) but the heartbeat duty still falls on us."""

from __future__ import annotations

import threading
import time
from collections.abc import Callable, Sequence

from .config import EngineConfig
from .retry import Backoff, with_backoff
from .sources.postgres import heartbeat_tick_sql

RunSql = Callable[[str], Sequence[tuple]]


class HeartbeatRunner:
    def __init__(
        self,
        run_sql: RunSql,
        config: EngineConfig,
        interval_s: float = 10.0,
        backoff: Backoff | None = None,
        sleep: Callable[[float], None] = time.sleep,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.run_sql = run_sql
        self.sql = heartbeat_tick_sql(config)
        self.interval_s = interval_s
        self.backoff = backoff or Backoff()
        self._sleep = sleep
        self._clock = clock
        self._stop = threading.Event()
        self._last_tick: float | None = None
        self.ticks = 0

    def tick(self) -> None:
        """One heartbeat write, retried through transient failures."""
        with_backoff(lambda: self.run_sql(self.sql), self.backoff, sleep=self._sleep)
        self.ticks += 1
        self._last_tick = self._clock()

    def tick_if_due(self) -> bool:
        if self._last_tick is not None and (
            self._clock() - self._last_tick < self.interval_s
        ):
            return False
        self.tick()
        return True

    def stop(self) -> None:
        self._stop.set()

    def run(self, max_ticks: int | None = None) -> None:
        """Ticker loop (heartbeat.go:96-131). Runs until stop()."""
        while not self._stop.is_set():
            if max_ticks is not None and self.ticks >= max_ticks:
                break
            self.tick_if_due()
            if self._stop.is_set():
                break
            self._sleep(min(self.interval_s, 1.0))

    def start_thread(self) -> threading.Thread:
        t = threading.Thread(target=self.run, name="cdc-heartbeat", daemon=True)
        t.start()
        return t
