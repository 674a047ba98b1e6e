"""Deterministic rule miner — the distributed recast of the reference's
LLM slow path + rule-generation feedback loop.

Reference behavior being recast (not ported):

* slow path: LLM extracts values for fields no cached rule matched
  (src/pipeline.py:72-143);
* rule generation: a second LLM synthesizes a (rule, validation_regex)
  pair, validated up to ``max_attempts`` times against the source example
  with three checks — syntax, extraction equality, validation-regex match
  (src/rule.py:107-257); accepted rules enter the per-(label, field) cache.

Here the rule *source* is a deterministic, corpus-driven synthesizer that
runs as a grouped ``applyInPandas`` over the (label, field) groups that the
extraction pass left unresolved. No network calls; every candidate is
validated with the same three checks the reference used, against **all**
sampled source examples instead of one.

Synthesis strategy (anchor + shape induction, mirroring the structure of
the reference's learned rules — e.g. the null-field lookahead template the
reference prompts for at src/llm.py:616-749 and the anchored value rules in
its shipped caches):

1. The field's **anchor** is its rendered label (``field.replace('_',' ')
   .title()`` — how document templates label values; reference generator
   scripts/generate_fake_data.py:242). Other fields' anchors form the
   right **boundary** lookahead (value runs until the next field label or
   end of document).
2. A generic bounded capture extracts candidate values from the group's
   example texts (the deterministic analog of LLM value extraction).
3. Null examples (anchor immediately followed by another anchor) yield a
   null rule ``anchor ()(?=boundary)`` with validation ``^$``; value
   examples yield a value rule whose capture class and validation regex are
   **induced from the observed value shapes** (digits-only -> ``\\d{m,M}``,
   etc.), generalizing beyond the seen examples without admitting other
   fields' labels.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterable, Optional

import pandas as pd

from ..functions.rules import compile_cached, execute_rule, validate_value

MINED_DDL = (
    "label string, field string, rule string, validation_regex string, "
    "kind string, support bigint, pass_rate double"
)


def field_anchor(field: str) -> str:
    """Rendered label under which a field appears in document text."""
    return field.replace("_", " ").title()


def _boundary_lookahead(field: str, all_fields: Iterable[str]) -> str:
    """Lookahead alternation over the other fields' anchors (+ end)."""
    others = [field_anchor(f) for f in all_fields if f != field]
    alts = sorted({re.escape(a) for a in others}, key=len, reverse=True)
    inner = "|".join(alts + ["$"])
    return f"(?=[\\s]*(?:{inner}))"


def direct_extract_value(
    text: Optional[str], field: str, all_fields: list[str]
) -> Optional[str]:
    """Deterministic slow-path extraction of one field from normalized text
    (the LLM-extractor analog). Returns value, "" for present-but-empty
    (null field), or None when the anchor is absent / text is null."""
    if not text:
        return None
    anchor = re.escape(field_anchor(field))
    boundary = _boundary_lookahead(field, all_fields)
    pat = compile_cached(
        rf"(?i){anchor}[\s:\-]*([\s\S]*?){boundary}", re.DOTALL
    )
    if pat is None:
        return None
    m = pat.search(text)
    if not m:
        return None
    return m.group(1).strip()


def direct_extract_series(
    label: str, all_fields: list[str], field: str, texts: pd.Series
) -> pd.Series:
    """Vectorized form of :func:`direct_extract_value` (the
    ``direct_extractor`` hook of operators.extract)."""
    anchor = re.escape(field_anchor(field))
    boundary = _boundary_lookahead(field, all_fields)
    pat = compile_cached(rf"(?i){anchor}[\s:\-]*([\s\S]*?){boundary}", re.DOTALL)
    out = texts.str.extract(pat, expand=True).iloc[:, 0].str.strip()
    return out.where(out.notna(), None)


# ---------------------------------------------------------------------------
# Value-shape induction
# ---------------------------------------------------------------------------

_CLASS_DIGIT = "0-9"
_CLASS_ALPHA = "A-Za-zÀ-ÖØ-öø-ÿ"


def induce_shape(values: list[str]) -> tuple[str, str]:
    """Induce (capture_class_regex, validation_regex) from observed values.

    Digits-only values get a tight ``\\d{m,M}`` pair; mixed values get a
    character-class union of what was actually observed (letters incl.
    Latin-1 accents, digits, space, and the literal punctuation seen),
    with a +/- slack on length so the rule generalizes to unseen documents
    of the same template."""
    lengths = [len(v) for v in values]
    lo = max(1, min(lengths) // 2)
    hi = max(lengths) * 2
    if all(v.isdigit() for v in values):
        return rf"([{_CLASS_DIGIT}]{{{lo},{hi}}})", rf"^[{_CLASS_DIGIT}]{{{lo},{hi}}}$"
    classes = set()
    puncts = set()
    for v in values:
        for ch in v:
            if ch.isdigit():
                classes.add(_CLASS_DIGIT)
            elif ch.isalpha():
                classes.add(_CLASS_ALPHA)
            elif ch == " ":
                classes.add(" ")
            else:
                puncts.add(ch)
    body = "".join(sorted(classes)) + "".join(re.escape(p) for p in sorted(puncts))
    # lazy capture so the boundary lookahead decides the end
    return rf"([{body}]{{{lo},{hi}}}?)", rf"^[{body}]{{{lo},{hi}}}$"


# ---------------------------------------------------------------------------
# Candidate synthesis + the reference's three validation checks
# ---------------------------------------------------------------------------


@dataclass
class MinedRule:
    label: str
    field: str
    rule: str
    validation_regex: str
    kind: str  # "value" | "null"
    support: int
    pass_rate: float


def _three_checks(rule: str, vregex: str, examples: list[tuple[str, str]]) -> float:
    """Reference validation checks (src/rule.py:214-233) over all examples:
    1) syntax (compiles), 2) extraction equality, 3) validation-regex match.
    Returns pass fraction (0.0 if syntax fails)."""
    if compile_cached(rule, re.DOTALL) is None or compile_cached(vregex, 0) is None:
        return 0.0
    ok = 0
    for text, expected in examples:
        got = execute_rule(rule, text)
        if got == expected and validate_value(vregex, expected):
            ok += 1
    return ok / len(examples) if examples else 0.0


def mine_field_rules(
    label: str,
    field: str,
    all_fields: list[str],
    texts: list[str],
    min_pass_rate: float = 0.9,
    max_examples: int = 64,
) -> list[MinedRule]:
    """Mine up to two rules (value + null) for one (label, field) group."""
    texts = [t for t in texts if t][:max_examples]
    if not texts:
        return []
    anchor = re.escape(field_anchor(field))
    boundary = _boundary_lookahead(field, all_fields)

    # Slow-path extraction over the group's examples.
    examples = []
    for t in texts:
        v = direct_extract_value(t, field, all_fields)
        if v is not None:
            examples.append((t, v))
    if not examples:
        return []

    null_ex = [(t, v) for t, v in examples if v == ""]
    val_ex = [(t, v) for t, v in examples if v != ""]
    mined: list[MinedRule] = []

    if val_ex:
        capture, vregex = induce_shape([v for _, v in val_ex])
        # Keyword-contamination guard: on a null doc the lazy capture could
        # swallow the *next field's anchor* and stop at the anchor after it;
        # reject any value containing another field's label. The reference's
        # learned rules carry the same negative lookahead in their
        # validation regexes (e.g. the `nome` rule in
        # data/fake/caches/fake_dataset_1000samples_seed_1_cache.json), and
        # its generator prompts for it (src/llm.py keyword guard).
        others = sorted(
            {re.escape(field_anchor(f)) for f in all_fields if f != field},
            key=len,
            reverse=True,
        )
        if others:
            vregex = rf"^(?!.*(?i:(?:{'|'.join(others)}))){vregex[1:]}"
        rule = rf"(?i){anchor}[\s:\-]*{capture}{boundary}"
        rate = _three_checks(rule, vregex, val_ex)
        if rate >= min_pass_rate:
            mined.append(
                MinedRule(label, field, rule, vregex, "value", len(val_ex), rate)
            )
    if null_ex:
        rule = rf"(?i){anchor}[\s]*(){boundary}"
        rate = _three_checks(rule, "^$", null_ex)
        if rate >= min_pass_rate:
            mined.append(
                MinedRule(label, field, rule, "^$", "null", len(null_ex), rate)
            )
    return mined


def make_miner_fn(min_pass_rate: float = 0.9, max_examples: int = 64):
    """Grouped applyInPandas body: one (label, field) group in, zero or more
    mined-rule rows out. Group payload columns: label, field, norm_text,
    schema_fields (all fields, for boundary anchors)."""

    def mine_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=[
                "label", "field", "rule", "validation_regex", "kind",
                "support", "pass_rate",
            ])
        label = pdf["label"].iloc[0]
        field = pdf["field"].iloc[0]
        all_fields = list(pdf["all_fields"].iloc[0])
        mined = mine_field_rules(
            label,
            field,
            all_fields,
            list(pdf["norm_text"]),
            min_pass_rate=min_pass_rate,
            max_examples=max_examples,
        )
        return pd.DataFrame(
            [
                {
                    "label": m.label,
                    "field": m.field,
                    "rule": m.rule,
                    "validation_regex": m.validation_regex,
                    "kind": m.kind,
                    "support": m.support,
                    "pass_rate": m.pass_rate,
                }
                for m in mined
            ],
            columns=[
                "label", "field", "rule", "validation_regex", "kind",
                "support", "pass_rate",
            ],
        )

    return mine_group
