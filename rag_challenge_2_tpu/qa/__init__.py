from .processor import QAConfig, QuestionsProcessor
from .val_online import ValOnline
