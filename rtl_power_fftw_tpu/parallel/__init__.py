from .mesh import make_mesh  # noqa: F401
from .sharded import ShardedPsdStep  # noqa: F401
from .longint import sharded_accumulate  # noqa: F401
from .bigfft import ShardedLargeFFTPsd  # noqa: F401
from .grid import GridPsdStep, make_grid_mesh  # noqa: F401
from .multistream import MultiStreamAcquisition  # noqa: F401
