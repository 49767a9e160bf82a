from .timing import hms
