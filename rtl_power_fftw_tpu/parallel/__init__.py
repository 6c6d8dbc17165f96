from .mesh import make_mesh  # noqa: F401
from .sharded import ShardedPsdStep  # noqa: F401
