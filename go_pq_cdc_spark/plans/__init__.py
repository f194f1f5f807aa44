from .registry import QuerySpec, REGISTRY, register, all_queries, all_oracles  # noqa: F401

# Importing these modules populates REGISTRY via @register decorators.
from . import relational  # noqa: F401,E402
from . import cdc  # noqa: F401,E402
from . import pipeline  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import cdc_extras  # noqa: F401,E402
from . import tpch_extra  # noqa: F401,E402
from . import tpch_complete  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import corpus  # noqa: F401,E402
from . import mining  # noqa: F401,E402
