from .processor import QAConfig, QuestionsProcessor
