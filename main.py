"""CLI for the TPU-native RAG pipeline.

Command set mirrors the reference's click CLI (reference main.py:6-64):
``parse-pdfs``, ``serialize-tables``, ``process-reports``,
``process-questions`` — plus ``bench`` (the driver metric) and ``query``
(one-shot retrieval inspection).  ``download-models`` exists for contract
parity; model weights here are the local encoder, nothing to download.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import click

from rag_challenge_2_tpu.pipeline import Pipeline, configs


def _pipeline(root: str, config: str, **overrides) -> Pipeline:
    import dataclasses

    # copy the preset: overrides must not mutate the shared registry entry
    run_config = dataclasses.replace(
        configs[config], **{k: v for k, v in overrides.items() if v is not None}
    )
    return Pipeline(Path(root), run_config)


@click.group()
def cli():
    """TPU-native RAG pipeline (rag_challenge_2_tpu)."""


@cli.command("download-models")
def download_models():
    """Warm local models (encoder init + compile-cache prime)."""
    from rag_challenge_2_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from rag_challenge_2_tpu.models.encoder import EmbeddingModel

    model = EmbeddingModel()
    emb = model.embed(["warmup 预热"])
    click.echo(f"encoder ready: dim={emb.shape[1]}")


@cli.command("parse-pdfs")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="base", show_default=True)
@click.option("--parallel/--sequential", default=False, show_default=True)
@click.option("--chunk-size", default=2, show_default=True)
@click.option("--max-workers", default=10, show_default=True)
@click.option("--parser", default="auto", show_default=True,
              type=click.Choice(["auto", "docling", "builtin"]),
              help="auto = docling when installed, else the built-in "
                   "parser (.txt + digital-text .pdf via minipdf)")
def parse_pdfs(root, config, parallel, chunk_size, max_workers, parser):
    """PDF/TXT reports → parsed-report JSONs."""
    _pipeline(root, config).parse_pdf_reports(
        parallel=parallel, chunk_size=chunk_size, max_workers=max_workers,
        parser=parser,
    )
    click.echo("parsed")


@cli.command("serialize-tables")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="base", show_default=True)
@click.option("--max-workers", default=5, show_default=True)
def serialize_tables(root, config, max_workers):
    """LLM table serialization over parsed reports."""
    _pipeline(root, config).serialize_tables(max_workers=max_workers)
    click.echo("serialized")


@cli.command("process-reports")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="base", show_default=True)
def process_reports(root, config):
    """Merge → markdown → chunk → build the on-device corpus index."""
    _pipeline(root, config).process_parsed_reports()
    click.echo("index built")


@cli.command("process-questions")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="qwen", show_default=True)
@click.option("--use-hyde/--no-hyde", default=None)
@click.option("--use-multi-query/--no-multi-query", default=None)
def process_questions(root, config, use_hyde, use_multi_query):
    """Answer questions.json against the built index."""
    p = _pipeline(root, config, use_hyde=use_hyde, use_multi_query=use_multi_query)
    result = p.process_questions()
    click.echo(json.dumps(result["statistics"], ensure_ascii=False))


@cli.command("query")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="base", show_default=True)
@click.option("--company", required=True)
@click.option("--question", required=True)
@click.option("--top-n", default=5, show_default=True)
@click.option("--method", default="basic", show_default=True,
              type=click.Choice(["basic", "ssg", "triangulation", "hybrid_expansion"]))
@click.option("--use-bm25/--no-bm25", default=False, show_default=True,
              help="fuse sparse BM25 hits into the dense results")
def query(root, config, company, question, top_n, method, use_bm25):
    """One-shot retrieval: show top chunks with scores (no answer LLM)."""
    from rag_challenge_2_tpu.index import load_index
    from rag_challenge_2_tpu.retrieval.engine import QueryEngine, SearchConfig

    p = _pipeline(root, config)
    idx, meta = load_index(p.paths.index_path)
    eng = QueryEngine(idx, meta)
    q_emb = p.embedder([question])
    cfg = SearchConfig(method=method, top_n=top_n, top_k=top_n, use_bm25=use_bm25)
    results = eng.materialize(
        eng.search(q_emb, company, question, cfg=cfg, query_texts=[question]), cfg
    )
    for r in results:
        click.echo(
            f"[{r['distance']:.4f}] {r['source_sha1']} p{r['page']} "
            f"hits={r['hit_count']} methods={r['method_count']}: {r['text'][:80]}"
        )


@cli.command("bench")
def bench():
    """Run the driver benchmark (prints one JSON line)."""
    import bench as bench_mod

    bench_mod.main()




@cli.command("serve")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="qwen", show_default=True)
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", default=8899, show_default=True)
@click.option("--company", default="金盘科技", show_default=True)
@click.option("--micro-batch", default=0, show_default=True,
              help="coalesce concurrent same-route searches into one "
                   "vmapped device dispatch (0 = off)")
def serve_cmd(root, config, host, port, company, micro_batch):
    """Launch the web QA frontend over the built index."""
    from rag_challenge_2_tpu.serving import serve

    p = _pipeline(root, config)
    if micro_batch:
        p.run_config = dataclasses.replace(p.run_config, micro_batch=micro_batch)
    serve(p.build_processor(), host=host, port=port, default_company=company,
          pdf_dir=p.paths.pdf_reports_dir)


@cli.command("train-encoder")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="base", show_default=True)
@click.option("--steps", default=200, show_default=True)
@click.option("--batch-size", default=64, show_default=True)
@click.option("--out", default=None, help="params npz (default <databases>/encoder_params.npz)")
def train_encoder(root, config, steps, batch_size, out):
    """Self-supervised (ICT) encoder pretraining on the chunked corpus."""
    from rag_challenge_2_tpu.index.build import load_chunked_reports
    from rag_challenge_2_tpu.models.pretrain import (
        PretrainConfig, pretrain_encoder, save_params,
    )
    from rag_challenge_2_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = _pipeline(root, config)
    reports = load_chunked_reports(p.paths.documents_dir)
    texts = [c["text"] for r in reports for c in r["content"]["chunks"]]
    model, stats = pretrain_encoder(
        texts, pre_cfg=PretrainConfig(steps=steps, batch_size=batch_size)
    )
    out = out or (p.paths.databases_path / "encoder_params.npz")
    save_params(model, out)
    click.echo(json.dumps({"params": str(out), **stats["final"]}, ensure_ascii=False))


@cli.command("eval-encoder")
@click.option("--ict-steps", default=5000, show_default=True)
@click.option("--supervised-steps", default=2000, show_default=True)
@click.option("--batch-size", default=64, show_default=True)
@click.option("--out", default=None, help="write results json here")
def eval_encoder(ict_steps, supervised_steps, batch_size, out):
    """Encoder retrieval-quality experiment (BASELINE config 4): synthetic
    Chinese financial corpus, held-out paraphrase queries, hit@10/MRR of
    random-init vs ICT vs ICT+supervised vs the BM25 baseline."""
    from rag_challenge_2_tpu.eval.encoder_quality import run_quality_eval
    from rag_challenge_2_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    res = run_quality_eval(
        ict_steps=ict_steps, supervised_steps=supervised_steps,
        batch_size=batch_size, log=click.echo,
    )
    line = json.dumps(res, ensure_ascii=False)
    click.echo(line)
    if out:
        with open(out, "w", encoding="utf-8") as f:
            f.write(line)


@cli.command("analyze-similarity")
@click.option("--root", default="data/test_set", show_default=True)
@click.option("--config", default="base", show_default=True)
@click.option("--doc", default=0, show_default=True, help="document id")
@click.option("--out", default=None, help="output dir (default <databases>/similarity)")
def analyze_similarity(root, config, doc, out):
    """Chunk-to-chunk cosine matrix + stats for one document
    (the reference's semantic_similarity_analysis)."""
    from rag_challenge_2_tpu.eval.similarity import analyze_document
    from rag_challenge_2_tpu.index import load_index

    p = _pipeline(root, config)
    idx, meta = load_index(p.paths.index_path)
    out = out or (p.paths.databases_path / "similarity")
    stats = analyze_document(idx, meta, doc, output_dir=out)
    click.echo(json.dumps(stats, ensure_ascii=False))



@cli.command("rank")
@click.option("--submissions-dir", required=True, type=click.Path(exists=True))
@click.option("--answers", required=True, type=click.Path(exists=True),
              help="canonical answers JSON (question -> {kind, answers, reference_pools})")
@click.option("--max-questions", default=60, show_default=True)
@click.option("--csv-out", default=None)
def rank(submissions_dir, answers, max_questions, csv_out):
    """Score submissions against canonical answers (the reference's rank.py)."""
    from rag_challenge_2_tpu.eval import rank_submissions

    scores = rank_submissions(
        Path(submissions_dir), Path(answers),
        max_questions=max_questions,
        csv_out=Path(csv_out) if csv_out else None,
    )
    for i, s in enumerate(scores):
        click.echo(f"{i+1}. {s.submission_name or s.file_name}: "
                   f"score={s.score:.2f} (val {s.val_score:.1f} + ref {s.ref_score:.1f}/2)")



if __name__ == "__main__":
    cli()
