"""The fused fast-path extraction operator.

One ``mapInPandas`` pass per refinement round does everything the
reference's per-document loop did (reference src/main.py:179-325 fast path +
src/pipeline.py:22-64), vectorized per Arrow batch:

    assemble text from spans -> normalize -> per (label, field): first-match
    rule application in priority order -> output span construction + media
    passthrough -> hit/miss bookkeeping for weight aggregation and mining.

The rule set rides in as a **broadcast** ``RuleBook`` (KB-scale — ~300 B per
rule measured on the reference's converged caches), so the pass is a
broadcast nested-loop join with first-match short-circuit: zero shuffle,
scales linearly with executors. Weights are NOT mutated in place (the
reference bubbles a linked list, src/cache.py:249-289); each resolved
(doc, field) emits its winning ``rule_id`` and the driver aggregates
``groupBy(rule_id).count()`` into the rules table per round — end-of-round
totals are order-independent, which preserves the reference's end-state
(SURVEY §2.4).

Optional ``direct_extractor`` is the deterministic slow-path analog of the
reference's LLM extractor (src/pipeline.py:72-143): a callable
``(label, fields, texts: pd.Series) -> dict[field -> pd.Series]`` consulted
only for (doc, field) pairs no rule resolved.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.normalize import normalize_series
from ..functions.rules import RuleBook, apply_rules_vectorized

EXTRACTED_DDL = (
    "doc_id string, "
    "label string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "hits array<struct<field:string,rule_id:bigint,path:string>>, "
    "unresolved array<string>, "
    "n_text_spans int, n_media_spans int, "
    # mining payload — populated only for docs with unresolved fields so the
    # round loop never re-normalizes the corpus; null for resolved docs
    # (keeps the fast-path output narrow at scale)
    "norm_text string, all_fields array<string>, "
    # executor partition id for per-partition lineage/metrics
    "part_id int"
)

# path markers for per-field provenance (metrics + tests)
PATH_RULE = "rule"       # resolved by a cached rule (fast path)
PATH_DIRECT = "direct"   # resolved by the deterministic direct extractor
PATH_NONE = "none"       # unresolved -> null output value


def _assemble(spans: list) -> tuple[str, list]:
    """Split one span array into (document text, media spans in order).

    Spans arrive offset-ordered from the writer; sort defensively anyway
    (offset order is the contract, array order is not).
    """
    # spans arrives as a numpy array of dicts from Arrow — length-check, not
    # truthiness (ambiguous for arrays)
    ordered = (
        sorted(spans, key=lambda s: s["offset"])
        if spans is not None and len(spans)
        else []
    )
    text_parts = []
    media = []
    for s in ordered:
        if s["kind"] == "text":
            text_parts.append(s["text"] or "")
        elif s["kind"] == "media":
            media.append(s)
    return "".join(text_parts), media


def make_extract_fn(
    rulebook_bc,
    direct_extractor: Optional[Callable] = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Build the mapInPandas function over input-span batches.

    ``rulebook_bc``: a ``sc.broadcast(RuleBook)`` handle (or a plain
    RuleBook for in-process testing).
    """

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from pyspark import TaskContext

            tc = TaskContext.get()
            part_id = tc.partitionId() if tc is not None else -1
        except Exception:
            part_id = -1
        book: RuleBook = (
            rulebook_bc.value if hasattr(rulebook_bc, "value") else rulebook_bc
        )
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            assembled = [_assemble(sp) for sp in pdf["spans"]]
            texts = normalize_series(
                pd.Series([a[0] for a in assembled], index=pdf.index, dtype="object")
            )
            media_lists = [a[1] for a in assembled]
            n_text = [sum(1 for s in sp if s["kind"] == "text") for sp in pdf["spans"]]

            # Group rows by (label, ordered field tuple) so each group gets
            # one vectorized pass per field. In practice one group per label.
            field_names = [
                tuple(f["name"] for f in sf) for sf in pdf["schema_fields"]
            ]
            groups: dict[tuple, list[int]] = {}
            for pos, key in enumerate(zip(pdf["label"], field_names)):
                groups.setdefault(key, []).append(pos)

            # per-row accumulators (positional)
            out_values: list[list] = [[] for _ in range(n)]
            out_hits: list[list] = [[] for _ in range(n)]
            out_unres: list[list] = [[] for _ in range(n)]

            for (label, fields), positions in groups.items():
                idx = pdf.index[positions]
                gtexts = texts.loc[idx]
                direct_cache: dict[str, pd.Series] = {}
                for fname in fields:
                    rules = book.rules_for(label, fname)
                    vals, ids = apply_rules_vectorized(gtexts, rules)
                    need_direct = (
                        [i for i in idx if ids.loc[i] == -1]
                        if direct_extractor is not None
                        else []
                    )
                    if need_direct:
                        if fname not in direct_cache:
                            direct_cache[fname] = direct_extractor(
                                label, list(fields), fname, gtexts
                            )
                        dvals = direct_cache[fname]
                    for pos, i in zip(positions, idx):
                        rid = ids.loc[i]
                        if rid != -1:
                            v = vals.loc[i]
                            # "" -> null in the answer (src/pipeline.py:52-57)
                            out_values[pos].append((fname, None if v == "" else v))
                            out_hits[pos].append(
                                {"field": fname, "rule_id": int(rid), "path": PATH_RULE}
                            )
                        elif direct_extractor is not None and i in dvals.index and dvals.loc[i] is not None:
                            v = dvals.loc[i]
                            out_values[pos].append((fname, None if v == "" else v))
                            out_hits[pos].append(
                                {"field": fname, "rule_id": -1, "path": PATH_DIRECT}
                            )
                            out_unres[pos].append(fname)  # still unresolved by rules
                        else:
                            out_values[pos].append((fname, None))
                            out_hits[pos].append(
                                {"field": fname, "rule_id": -1, "path": PATH_NONE}
                            )
                            out_unres[pos].append(fname)

            # Build output span arrays: field spans in schema order, then
            # media passthrough in original order, offsets renumbered.
            out_spans = []
            for pos in range(n):
                spans = [
                    {"kind": f, "text": v, "media_ref": None, "offset": i}
                    for i, (f, v) in enumerate(out_values[pos])
                ]
                base = len(spans)
                spans.extend(
                    {
                        "kind": "media",
                        "text": None,
                        "media_ref": m["media_ref"],
                        "offset": base + j,
                    }
                    for j, m in enumerate(media_lists[pos])
                )
                out_spans.append(spans)

            texts_list = list(texts)
            fields_list = [list(ft) for ft in field_names]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "label": pdf["label"].values,
                    "spans": out_spans,
                    "hits": out_hits,
                    "unresolved": out_unres,
                    "n_text_spans": pd.array(n_text, dtype="int32"),
                    "n_media_spans": pd.array(
                        [len(m) for m in media_lists], dtype="int32"
                    ),
                    "norm_text": [
                        texts_list[pos] if out_unres[pos] else None for pos in range(n)
                    ],
                    "all_fields": [
                        fields_list[pos] if out_unres[pos] else None for pos in range(n)
                    ],
                    "part_id": pd.array([part_id] * n, dtype="int32"),
                }
            )

    return extract_batches


def extract_documents(
    docs: DataFrame,
    rulebook: RuleBook,
    direct_extractor: Optional[Callable] = None,
) -> DataFrame:
    """Run the fused extraction pass. Narrow (no shuffle): one mapInPandas
    over the input partitioning, rules via broadcast."""
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(rulebook)
    fn = make_extract_fn(bc, direct_extractor=direct_extractor)
    return docs.mapInPandas(fn, schema=EXTRACTED_DDL)


def salted_repartition(docs: DataFrame, num_partitions: int) -> DataFrame:
    """Explicit skew-defeating repartition by hashed doc_id.

    doc_ids are often monotonic (range-generated or ingest-ordered) and
    document *sizes* are heavy-tailed; hashing decorrelates both so every
    partition gets a uniform sample of sizes (north_rule: "salted
    repartitioning by doc_id hash to defeat large-PDF skew"). AQE's
    coalescing then trims any residual imbalance.
    """
    from pyspark.sql import functions as F

    return docs.repartition(num_partitions, F.xxhash64("doc_id"))
