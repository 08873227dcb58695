from . import tokenize, timing
from .cache import enable_compile_cache
