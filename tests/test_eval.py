"""Scorer rules vs reference semantics + judge harness offline."""

import json

import pytest

from rag_challenge_2_tpu.eval import (
    Answer,
    AnswerSubmission,
    CanonicData,
    JudgeHarness,
    compare,
    reference_score,
    score_submission,
)
from rag_challenge_2_tpu.llm import LLMFacade, StubProvider


# ---------------------------------------------------------------- compare

def test_number_one_percent_tolerance():
    assert compare("number", "100", 100.9) == 1.0
    assert compare("number", "100", 101.1) == 0.0
    assert compare("number", "100", "abc") == 0.0


def test_na_handling():
    assert compare("number", "N/A", "N/A") == 1.0
    assert compare("number", "100", "N/A") == 0.0
    assert compare("number", "N/A", 100) == 0.0


def test_boolean_and_name_case_insensitive():
    assert compare("boolean", "True", True) == 1.0
    assert compare("boolean", "true", False) == 0.0
    assert compare("name", " ABC Corp ", "abc corp") == 1.0


def test_names_jaccard():
    assert compare("names", "a,b", ["a", "b"]) == 1.0
    assert compare("names", "a,b", ["a", "c"]) == pytest.approx(1 / 3)
    assert compare("names", "a,b", "a, b") == 1.0  # string form split on comma


# ---------------------------------------------------------------- refs

def test_reference_score_penalties():
    pools = [["s1:1", "s1:2"], ["s2:5"]]
    # perfect: one ref from each pool
    assert reference_score(["s1:1", "s2:5"], pools) == 1.0
    # an out-of-pool ref costs 0.1
    assert reference_score(["s1:1", "s2:5", "bogus:9"], pools) == pytest.approx(0.9)
    # a missed pool costs 0.25
    assert reference_score(["s1:1"], pools) == pytest.approx(0.75)
    # floor at 0
    assert reference_score(["x:1"] * 20, pools) == 0.0
    # no pools and no refs → full score
    assert reference_score([], []) == 1.0


def test_score_submission_total():
    canonic = {
        "q1": CanonicData(kind="number", answers=["100"], reference_pools=[["s:0"]]),
        "q2": CanonicData(kind="name", answers=["ACME"], reference_pools=[]),
        "q3": CanonicData(kind="number", answers=[], reference_pools=[]),  # no rank
    }
    sub = AnswerSubmission(answers=[
        Answer(question_text="q1", kind="number", value=100.5,
               references=[{"pdf_sha1": "s", "page_index": 0}]),
        Answer(question_text="q2", kind="name", value="acme"),
        Answer(question_text="q3", kind="number", value=1),  # canonic has no answers → no_rank
    ])
    s = score_submission(sub, canonic)
    assert s.val_score == 2.0
    # q2: no pools but predicted no refs → ref 1.0; q1 ref 1.0
    assert s.ref_score == 2.0
    assert s.score == 3.0
    assert s.no_rank == 1 and s.missing == 0


# ---------------------------------------------------------------- judge

def _judge():
    return JudgeHarness(LLMFacade(StubProvider({
        "标准答案": json.dumps({"score": 1.0, "reasoning": "一致", "is_correct": True}),
    })))


def test_judge_all_and_stats(tmp_path):
    records = [
        {"question": "2024年营收是多少", "standard_answer": "100亿", "rag_answer": "100亿"},
        {"question": "是否分红", "standard_answer": "是", "rag_answer": "是"},
    ]
    out = _judge().judge_all(records, tmp_path / "eval.json")
    assert out["statistics"]["accuracy"] == 1.0
    saved = json.loads((tmp_path / "eval.json").read_text())
    assert saved["statistics"]["total"] == 2


def test_fix_evaluation_results(tmp_path):
    path = tmp_path / "eval.json"
    path.write_text(json.dumps({"records": [
        {"question": "q收入1", "standard_answer": "1", "rag_answer": "1",
         "evaluation": {"score": 1.0, "reasoning": "好", "is_correct": True}},
        {"question": "q收入2", "standard_answer": "2", "rag_answer": "2",
         "evaluation": {"score": 0.0, "reasoning": "", "is_correct": False}},
    ]}, ensure_ascii=False))
    res = _judge().fix_evaluation_results(path)
    assert res["fixed"] == 1
    assert res["statistics"]["failed_judgments"] == 0
    # backup written
    assert list(tmp_path.glob("eval.bak-*.json"))
    fixed = json.loads(path.read_text())
    assert fixed["records"][1]["evaluation"]["is_correct"] is True


def test_rank_submissions_end_to_end(tmp_path):
    from rag_challenge_2_tpu.eval import rank_submissions

    answers = {
        "q1": {"kind": "number", "answers": ["100"], "reference_pools": [["s:0"]]},
        "q2": {"kind": "boolean", "answers": ["true"], "reference_pools": []},
    }
    (tmp_path / "answers.json").write_text(json.dumps(answers))
    subs = tmp_path / "subs"
    subs.mkdir()
    (subs / "a.json").write_text(json.dumps({
        "submission_name": "good", "team_email": "", "signature": "",
        "answers": [
            {"question_text": "q1", "kind": "number", "value": 100,
             "references": [{"pdf_sha1": "s", "page_index": 0}]},
            {"question_text": "q2", "kind": "boolean", "value": True, "references": []},
        ],
    }))
    (subs / "b.json").write_text(json.dumps({
        "submission_name": "bad", "team_email": "", "signature": "",
        "answers": [
            {"question_text": "q1", "kind": "number", "value": 50, "references": []},
        ],
    }))
    csv_out = tmp_path / "ranking.csv"
    scores = rank_submissions(subs, tmp_path / "answers.json", csv_out=csv_out)
    assert scores[0].submission_name == "good"
    assert scores[0].score == 2.0 + 2.0 / 2
    assert scores[1].submission_name == "bad" and scores[1].missing == 1
    assert csv_out.exists()


def test_stage_timer():
    import time as _t
    from rag_challenge_2_tpu.utils.timing import StageTimer

    t = StageTimer()
    with t.stage("a"):
        _t.sleep(0.01)
    with t.stage("a"):
        _t.sleep(0.01)
    t.record("b", 1.5)
    d = t.as_dict()
    assert d["a"] >= 0.02 and d["b"] == 1.5
