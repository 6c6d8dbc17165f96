from .datastore import Datastore, AcquisitionResult  # noqa: F401
