# stage modules: discover, extract, link, materialize
from . import discover, extract, link, materialize  # noqa: F401
