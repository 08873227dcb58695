from .judge import JudgeHarness, summarize
from .scorer import (
    Answer,
    AnswerSubmission,
    CanonicData,
    compare,
    rank_submissions,
    reference_score,
    score_submission,
)
