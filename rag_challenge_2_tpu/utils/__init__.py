from . import tokenize, timing
