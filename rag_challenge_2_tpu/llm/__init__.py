from . import prompts, schemas
from .facade import LLMFacade
from .glossary import FINANCIAL_GLOSSARY, find_financial_concepts, format_glossary_context
from .jsonfix import loads_lenient
from .providers import (
    ChatProvider,
    GeminiProvider,
    OpenAICompatProvider,
    StubProvider,
    get_provider,
)
from .reranker import JinaReranker, LLMReranker, RateLimiter
