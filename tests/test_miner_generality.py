"""Miner generality: the adaptive loop must learn templates it has never
seen — random schemas, random field-name anchors, mixed value shapes — not
just the reference's OAB card. (The reference names generality as the core
difficulty, README.md:186-196.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adaptive_pdf_extractor_spark.plans.evaluate import field_accuracy
from adaptive_pdf_extractor_spark.plans.pipeline import (
    ExtractionPipeline,
    PipelineConfig,
)
from adaptive_pdf_extractor_spark.sources import corpus as corpus_mod
from adaptive_pdf_extractor_spark.sources import spark_io

_WORDS = ["registro", "emissao", "codigo", "orgao", "validade", "titular",
          "protocolo", "unidade", "classe", "referencia", "matricula", "lote"]


def _random_template(rng: corpus_mod._Rng, label: str, n_fields: int):
    """Random schema: field names from word pairs, one value shape each."""
    names = []
    used = set()
    while len(names) < n_fields:
        w = f"{rng.choice(_WORDS)}_{rng.choice(_WORDS)}"
        if w not in used:
            used.add(w)
            names.append(w)
    shapes = [rng.choice(["digits", "word", "mixed", "code"]) for _ in names]
    return list(zip(names, shapes))


def _value(rng: corpus_mod._Rng, shape: str) -> str:
    if shape == "digits":
        return str(rng.randint(10**4, 10**8))
    if shape == "word":
        return f"{rng.choice(_WORDS).title()} {rng.choice(_WORDS).title()}"
    if shape == "code":
        return f"{rng.randint(10, 99)}.{rng.randint(100, 999)}-{rng.randint(0, 9)}"
    return f"{rng.choice(_WORDS).title()} {rng.randint(100, 9999)}"


def _random_corpus(seed: int, label: str, template, count: int):
    rows = []
    for i in range(count):
        doc_id = f"{label}/{i:06d}"
        rng = corpus_mod._Rng(corpus_mod._stable_hash(f"{seed}:{doc_id}"))
        chunks, expected = [], {}
        for fname, shape in template:
            title = fname.replace("_", " ").title()
            if rng.random() < 0.7:
                v = _value(rng, shape)
                expected[fname] = v
                chunks.append((title, v))
            else:
                expected[fname] = None
                chunks.append((title, None))
        if rng.random() < 0.33:
            rng.shuffle(chunks)
        seps = ["\n"] * 8 + [""] * 2 + [" "] * 6 + ["   "] * 2 + ["\t"] * 2
        text = ""
        for title, v in chunks:
            text += title + rng.choice(seps)
            if v is not None:
                text += v
        rows.append(
            {
                "doc_id": doc_id,
                "spans": corpus_mod.text_to_spans(doc_id, text),
                "label": label,
                "schema_fields": [
                    {"name": n, "description": s} for n, s in template
                ],
                "expected": [
                    {"name": n, "value": expected[n]} for n, _ in template
                ],
            }
        )
    return rows


@pytest.mark.parametrize("seed", [101, 202])
def test_learns_unseen_random_templates(spark, tmp_path, seed):
    rng = corpus_mod._Rng(seed)
    rows = []
    # three labels, different random schemas (4-7 fields each)
    for li in range(3):
        label = f"tmpl_{seed}_{li}"
        template = _random_template(rng, label, 4 + rng.randint(0, 3))
        rows += _random_corpus(seed * 10 + li, label, template, 120)
    docs = spark_io.input_df_from_rows(spark, rows)
    pipe = ExtractionPipeline(
        spark,
        str(tmp_path / f"gen{seed}"),
        PipelineConfig(max_rounds=3, num_partitions=4),
    )
    out = pipe.run(docs, initial_rules_rows=[], write_output=False)
    acc = field_accuracy(out, docs)
    assert acc.docs == 360
    assert acc.accuracy > 0.9, f"accuracy {acc.accuracy:.3f} on unseen templates"
    # rules learned for every label
    labels = {r["label"] for r in pipe.final_rules()}
    assert labels == {f"tmpl_{seed}_{li}" for li in range(3)}
