from .classify import classify_func
from .query import query_func
from .secondary import write_secondary_classes
