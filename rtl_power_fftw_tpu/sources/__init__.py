from .base import IQSource  # noqa: F401
from .synthetic import SyntheticSource  # noqa: F401
from .file import FileSource  # noqa: F401
from .registry import open_device, make_source  # noqa: F401
