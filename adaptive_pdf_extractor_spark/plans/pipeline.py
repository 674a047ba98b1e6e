"""The bounded-iterative-broadcast extraction pipeline.

This is the distributed recast of the reference's sequential adaptive loop
(src/main.py:179-325). Instead of mutating a cache document-by-document, the
corpus is scanned in **rounds**, each a stateless batch job over a frozen
broadcast rule set::

    round r:
      1. broadcast rules(r)  ->  fused extraction pass (operators.extract)
      2. weight aggregation: groupBy(rule_id).count() over this round's
         hits, summed into the rules table (replaces in-place bubble-up —
         end-state totals are order-independent, SURVEY §2.4)
      3. unresolved (doc, field) pairs  ->  hash-sampled  ->  grouped
         applyInPandas rule mining (operators.miner)
      4. accepted rules appended (weight=1, next rule_seq — matching the
         reference's add-at-tail, src/cache.py:182-199); rules snapshot +
         manifest committed (plans.checkpoint)
      until no new rules or max_rounds (analog of the reference's
      max_attempts feedback bound, src/main.py:62-67)

    final pass: extraction with the converged rules + the deterministic
      direct extractor as slow-path fallback for still-unresolved fields
      (the reference's answers for LLM-extracted fields come from the LLM
      directly, src/main.py:262 — the direct extractor is that analog).

Convergence: the unresolved-pair count is monotonically non-increasing
across rounds (rules are only added, never removed, and extraction is
deterministic), so the loop terminates in <= max_rounds scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rules import RuleBook
from ..operators.extract import extract_documents, salted_repartition
from ..operators.miner import (
    ANCHOR_DDL,
    MINED_DDL,
    direct_extract_series,
    make_discover_fn,
    make_miner_fn,
)
from ..sources import spark_io
from .checkpoint import RunManifest


@dataclass
class PipelineConfig:
    max_rounds: int = 5            # reference max_attempts default (src/main.py:62-67)
    min_pass_rate: float = 0.9
    max_examples_per_group: int = 64
    # Fraction of unresolved docs shipped to the miner, selected by stable
    # doc_id hash (deterministic). At 10^12 docs the miner needs only a few
    # thousand examples per (label, field); everything else is wasted I/O.
    miner_sample_mod: int = 1      # 1 = all; K = ~1/K of unresolved docs
    num_partitions: Optional[int] = None
    direct_fallback: bool = True
    # Corpus-driven anchor discovery (operators.miner.discover_label_anchors):
    # learn each field's rendered label from the documents instead of
    # assuming field.title(). Runs once, on a bounded per-label sample of
    # the first round's unresolved docs; discovered anchors persist in the
    # manifest so resumed runs replay identically.
    discover_anchors: bool = True
    anchor_sample_per_label: int = 128
    # Standalone keyword-contamination guard (miner.validate_no_other_keywords):
    # drop slow-path example values containing another field's keyword before
    # shape induction. Default OFF to match the reference, which defines the
    # check but leaves it disabled (src/rule.py:415-467, :235-241); the
    # always-on negative lookahead in mined validation regexes is separate.
    keyword_guard: bool = False
    # Main-content pre-stage: strip corpus-frequency boilerplate lines from
    # text spans before extraction (operators.layout.boilerplate_strip).
    # Off by default: the reference parity corpora are boilerplate-free and
    # the stage must reduce to identity there (SURVEY §2.11).
    strip_boilerplate: bool = False
    boilerplate_min_doc_frac: float = 0.5
    boilerplate_min_docs: int = 5
    extra: dict = dc_field(default_factory=dict)


def aggregate_weights(rules_rows: list[dict], extracted: DataFrame) -> list[dict]:
    """weights += this round's per-rule hit counts (distributed agg, tiny
    result). Partial aggregation (map-side combine) comes free from
    groupBy().count()."""
    hits = (
        extracted.select(F.explode("hits").alias("h"))
        .filter(F.col("h.path") == "rule")
        .groupBy(F.col("h.rule_id").alias("rule_id"))
        .count()
        .collect()
    )
    by_id = {r["rule_id"]: r["count"] for r in hits}
    out = []
    for row in rules_rows:
        row = dict(row)
        row["weight"] = int(row["weight"]) + int(by_id.get(row["rule_id"], 0))
        out.append(row)
    return out


def _next_ids(rules_rows: list[dict]) -> tuple[int, dict[tuple, int]]:
    next_id = max((r["rule_id"] for r in rules_rows), default=-1) + 1
    next_seq: dict[tuple, int] = {}
    for r in rules_rows:
        k = (r["label"], r["field"])
        next_seq[k] = max(next_seq.get(k, -1), r["rule_seq"])
    return next_id, {k: v + 1 for k, v in next_seq.items()}


class ExtractionPipeline:
    """Driver for the round loop with checkpointed exact resume."""

    def __init__(self, spark: SparkSession, run_dir: str, config: PipelineConfig | None = None):
        self.spark = spark
        self.run_dir = run_dir
        self.config = config or PipelineConfig()
        self.manifest = RunManifest(run_dir)
        # (label, field) -> anchor row dict; loaded for exact resume.
        self.anchors: dict[tuple, dict] = {
            (a["label"], a["field"]): a
            for a in self.manifest.state.get("anchors", [])
        }

    # -- internals -----------------------------------------------------------

    def _anchor_map(self) -> dict[tuple, str]:
        return {k: a["anchor"] for k, a in self.anchors.items()}

    def _extract(self, docs: DataFrame, rules_rows: list[dict], final: bool) -> DataFrame:
        book = RuleBook.from_rows(rules_rows)
        direct = None
        if final and self.config.direct_fallback:
            by_label: dict[str, dict[str, str]] = {}
            for (label, fld), a in self.anchors.items():
                by_label.setdefault(label, {})[fld] = a["anchor"]

            def direct(lbl, fields, fld, texts, _by_label=by_label):
                return direct_extract_series(
                    lbl, fields, fld, texts, anchors=_by_label.get(lbl)
                )

        return extract_documents(docs, book, direct_extractor=direct)

    def _discover_anchors(self, extracted: DataFrame, docs: DataFrame) -> None:
        """One bounded pass of corpus-driven anchor discovery for labels not
        yet covered: take the anchor_sample_per_label hash-smallest unresolved
        docs per label (deterministic at any parallelism), broadcast-join
        their schema/expected metadata from ``docs`` (streams the big side,
        no shuffle of docs), and mine anchors per label group. Results are
        driver state (KB-scale: labels x fields rows) persisted in the
        manifest, mirroring the rules table's lifecycle."""
        cfg = self.config
        covered = sorted({label for (label, _f) in self.anchors})
        need = extracted.filter(F.size("unresolved") > 0).select(
            "doc_id", "label", "norm_text"
        )
        # Same hash pre-sample as the miner: without it, the per-label
        # row_number window below shuffles EVERY unresolved row's norm_text
        # (few labels -> skewed reducers at corpus scale); with it, only
        # ~1/miner_sample_mod of them.
        if cfg.miner_sample_mod > 1:
            need = need.filter(
                F.pmod(F.xxhash64("doc_id"), F.lit(cfg.miner_sample_mod)) == 0
            )
        if covered:
            need = need.filter(~F.col("label").isin(covered))
        w = Window.partitionBy("label").orderBy(F.xxhash64("doc_id"), "doc_id")
        sample = (
            need.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cfg.anchor_sample_per_label)
            .drop("_rn")
        )
        meta_cols = [docs["doc_id"], docs["schema_fields"]]
        if "expected" in docs.columns:
            meta_cols.append(docs["expected"])
        else:
            meta_cols.append(
                F.lit(None)
                .cast("array<struct<name:string,value:string>>")
                .alias("expected")
            )
        meta = docs.select(*meta_cols)
        # Broadcast only the sampled doc_ids (bytes/label-row), not the
        # sample's norm_text payloads — at many-template scale the text
        # side is GBs and F.broadcast bypasses the auto threshold. The
        # second join is tiny-vs-tiny; AQE picks its strategy.
        keys = sample.select("doc_id")
        meta_small = meta.join(F.broadcast(keys), "doc_id")
        joined = meta_small.join(sample, "doc_id")
        rows = (
            joined.groupBy("label")
            .applyInPandas(
                make_discover_fn(max_texts=cfg.anchor_sample_per_label),
                schema=ANCHOR_DDL,
            )
            .collect()
        )
        for r in rows:
            key = (r["label"], r["field"])
            if key not in self.anchors:  # first discovery wins (replay-stable)
                self.anchors[key] = r.asDict()
        self.manifest.state["anchors"] = sorted(
            self.anchors.values(), key=lambda a: (a["label"], a["field"])
        )

    def _round_metrics(self, extracted: DataFrame) -> tuple[dict, list[dict]]:
        agg = extracted.groupBy("part_id").agg(
            F.count("*").alias("docs"),
            F.sum(F.size("unresolved")).alias("unresolved_fields"),
            F.sum(
                F.size(F.filter("hits", lambda h: h["path"] == F.lit("rule")))
            ).alias("rule_hits"),
            F.sum("n_text_spans").alias("text_spans"),
            F.sum("n_media_spans").alias("media_spans"),
        )
        lineage = [r.asDict() for r in agg.collect()]
        totals = {
            k: int(sum(r[k] or 0 for r in lineage))
            for k in ["docs", "unresolved_fields", "rule_hits", "text_spans", "media_spans"]
        }
        totals["fast_path_doc_rate"] = None  # filled by caller if wanted
        return totals, lineage

    def _mine(self, extracted: DataFrame) -> list[dict]:
        cfg = self.config
        pairs = (
            extracted.filter(F.size("unresolved") > 0)
            .filter(
                (F.pmod(F.xxhash64("doc_id"), F.lit(cfg.miner_sample_mod)) == 0)
                if cfg.miner_sample_mod > 1
                else F.lit(True)
            )
            .select(
                "doc_id",
                "label",
                "norm_text",
                "all_fields",
                F.explode("unresolved").alias("field"),
            )
        )
        # Deterministic example selection: keep the max_examples hash-smallest
        # doc_ids per (label, field) BEFORE the grouped UDF, so (a) the mined
        # rule is independent of partition/arrival order at any cluster size
        # (checkpoint.py replay contract) and (b) only a bounded number of
        # norm_text payloads per group ever shuffle — the rest of the
        # unresolved corpus never leaves its scan partition.
        w = Window.partitionBy("label", "field").orderBy(
            F.xxhash64("doc_id"), "doc_id"
        )
        pairs = (
            pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cfg.max_examples_per_group)
            .drop("_rn")
        )
        mined = pairs.groupBy("label", "field").applyInPandas(
            make_miner_fn(
                min_pass_rate=cfg.min_pass_rate,
                max_examples=cfg.max_examples_per_group,
                anchors=self._anchor_map(),
                keyword_guard=cfg.keyword_guard,
            ),
            schema=MINED_DDL,
        )
        return [r.asDict() for r in mined.collect()]

    def _accept(
        self, rules_rows: list[dict], mined: list[dict], round_no: int
    ) -> list[dict]:
        """Dedup mined candidates against the table and append accepted ones
        (weight=1 at tail — reference add_rule semantics)."""
        existing = {(r["label"], r["field"], r["rule"]) for r in rules_rows}
        next_id, next_seq = _next_ids(rules_rows)
        accepted = []
        for m in sorted(mined, key=lambda m: (m["label"], m["field"], m["kind"])):
            key = (m["label"], m["field"], m["rule"])
            if key in existing:
                continue
            existing.add(key)
            k = (m["label"], m["field"])
            seq = next_seq.get(k, 0)
            next_seq[k] = seq + 1
            accepted.append(
                {
                    "label": m["label"],
                    "field": m["field"],
                    "rule": m["rule"],
                    "validation_regex": m["validation_regex"],
                    "weight": 1,
                    "rule_seq": seq,
                    "round_added": round_no,
                    "rule_id": next_id,
                }
            )
            next_id += 1
        return accepted

    def _snapshot(self, rules_rows: list[dict], round_no: int) -> str:
        path = self.manifest.rules_snapshot_path(round_no)
        spark_io.write_table(
            spark_io.rules_df_from_rows(self.spark, rules_rows), path
        )
        return path

    @staticmethod
    def load_rules_snapshot(spark: SparkSession, path: str) -> list[dict]:
        rows = [r.asDict() for r in spark_io.read_table(spark, path).collect()]
        rows.sort(key=lambda r: r["rule_id"])
        return rows

    # -- entry ----------------------------------------------------------------

    def run(
        self,
        docs: DataFrame,
        initial_rules_rows: Optional[list[dict]] = None,
        write_output: bool = True,
    ) -> DataFrame:
        """Run (or resume) the full pipeline; returns the output span table."""
        cfg = self.config
        spans_before = None
        if cfg.strip_boilerplate:
            from ..operators.layout import strip_boilerplate_spans

            spans_before = docs.select(
                F.sum(F.size("spans")).alias("n")
            ).first()["n"] or 0
            docs = strip_boilerplate_spans(
                docs,
                min_doc_frac=cfg.boilerplate_min_doc_frac,
                min_docs=cfg.boilerplate_min_docs,
            )
        if cfg.num_partitions:
            docs = salted_repartition(docs, cfg.num_partitions)
        docs = docs.persist()
        try:
            if spans_before is not None:
                # AFTER persist: this first action materializes the cache,
                # so the two-shuffle strip plan executes exactly once
                # (counting before persisting re-ran it for round 0)
                spans_after = docs.select(
                    F.sum(F.size("spans")).alias("n")
                ).first()["n"] or 0
                # north_star metric: boilerplate strip rate
                self.manifest.state["boilerplate"] = {
                    "spans_before": int(spans_before),
                    "spans_after": int(spans_after),
                    "strip_rate": round(
                        1 - spans_after / spans_before, 6
                    ) if spans_before else 0.0,
                }
            start_round = self.manifest.last_completed_round() + 1
            if start_round > 0:
                rules_rows = self.load_rules_snapshot(
                    self.spark, self.manifest.latest_rules_path()
                )
            else:
                rules_rows = list(initial_rules_rows or [])

            # A finished run resumes straight to the final pass: its rules
            # are converged and committed; re-mining would append spurious
            # rounds to the manifest. Same for a run that crashed BETWEEN a
            # converged round's commit and finish(): the last committed
            # round's n_new_rules == 0 proves convergence, and an extra
            # resumed round would re-aggregate a whole pass of rule-weight
            # hits (which can flip priority order — not byte-identical).
            prev = next(
                (
                    r
                    for r in self.manifest.state.get("rounds", [])
                    if r["round"] == start_round - 1
                ),
                None,
            )
            converged = prev is not None and prev.get("n_new_rules", 1) == 0
            round_range = (
                []
                if (self.manifest.complete or converged)
                else range(start_round, cfg.max_rounds)
            )
            for round_no in round_range:
                extracted = self._extract(docs, rules_rows, final=False).persist()
                try:
                    rules_rows = aggregate_weights(rules_rows, extracted)
                    metrics, lineage = self._round_metrics(extracted)
                    if cfg.discover_anchors and not self.manifest.state.get(
                        "anchor_discovery_done"
                    ):
                        # Anchors are template properties: one discovery pass
                        # over the first executed round's unresolved docs
                        # covers every label that will ever reach the miner
                        # (unresolved labels shrink monotonically). The
                        # manifest flag (committed with the round) makes a
                        # RESUMED run skip re-discovery exactly like the
                        # uninterrupted run would — re-running on a later
                        # round's different sample could diverge.
                        self._discover_anchors(extracted, docs)
                        self.manifest.state["anchor_discovery_done"] = True
                    mined = self._mine(extracted)
                finally:
                    extracted.unpersist()
                accepted = self._accept(rules_rows, mined, round_no)
                rules_rows = rules_rows + accepted
                path = self._snapshot(rules_rows, round_no)
                metrics["n_rules"] = len(rules_rows)
                self.manifest.commit_round(
                    round_no, path, metrics, lineage, n_new_rules=len(accepted)
                )
                if not accepted:
                    break  # converged: another scan cannot change anything

            final = self._extract(docs, rules_rows, final=True).persist()
            try:
                output = final.select("doc_id", "spans")
                out_path = f"{self.run_dir}/output"
                if write_output:
                    spark_io.write_table(output, out_path)
                    output = spark_io.read_table(self.spark, out_path)
                # Final-pass metrics on BOTH paths (a persisted production
                # run must not finish with an empty summary); the persist
                # above makes this a cache scan, not a second extraction.
                summary, _ = self._round_metrics(final)
            finally:
                final.unpersist()
            self.manifest.finish(out_path if write_output else None, summary)
            return output
        finally:
            docs.unpersist()

    def final_rules(self) -> list[dict]:
        path = self.manifest.latest_rules_path()
        return self.load_rules_snapshot(self.spark, path) if path else []
