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

1. The field's **anchor** is the rendered label under which the template
   prints its value. The default guess is ``field.replace('_',' ').title()``
   (how the reference's fake-data generator labels values,
   scripts/generate_fake_data.py:242), but the reference's LLM extracts
   under *arbitrary* rendered labels (schema field ``nome`` printed as
   "Nome Completo:" or "Name" — src/pipeline.py:72-143, prompts
   src/llm.py:26-59). :func:`discover_label_anchors` recovers that
   capability deterministically by mining anchors from the corpus itself
   (see its docstring). Other fields' anchors form the right **boundary**
   lookahead (value runs until the next field label or end of document).
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
import unicodedata
from collections import Counter
from dataclasses import dataclass
from difflib import SequenceMatcher
from typing import Iterable, Optional

import pandas as pd

from ..functions.normalize import normalize_text
from ..functions.rules import compile_cached, execute_rule, validate_value

MINED_DDL = (
    "label string, field string, rule string, validation_regex string, "
    "kind string, support bigint, pass_rate double"
)

ANCHOR_DDL = "label string, field string, anchor string, source string, score double"


def field_anchor(field: str) -> str:
    """Default rendered label guess: the title-cased field name."""
    return field.replace("_", " ").title()


def _anchor_for(field: str, anchors: Optional[dict]) -> str:
    """Discovered anchor for ``field`` in the current label, else default."""
    a = (anchors or {}).get(field)
    return a if a else field_anchor(field)


def _boundary_lookahead(
    field: str, all_fields: Iterable[str], anchors: Optional[dict] = None
) -> str:
    """Lookahead alternation over the other fields' anchors (+ end)."""
    others = [_anchor_for(f, anchors) for f in all_fields if f != field]
    alts = sorted({re.escape(a) for a in others}, key=len, reverse=True)
    inner = "|".join(alts + ["$"])
    return f"(?=[\\s]*(?:{inner}))"


def direct_extract_value(
    text: Optional[str],
    field: str,
    all_fields: list[str],
    anchors: Optional[dict] = None,
) -> Optional[str]:
    """Deterministic slow-path extraction of one field from normalized text
    (the LLM-extractor analog). Returns value, "" for present-but-empty
    (null field), or None when the anchor is absent / text is null."""
    if not text:
        return None
    anchor = re.escape(_anchor_for(field, anchors))
    boundary = _boundary_lookahead(field, all_fields, anchors)
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
    label: str,
    all_fields: list[str],
    field: str,
    texts: pd.Series,
    anchors: Optional[dict] = None,
) -> pd.Series:
    """Vectorized form of :func:`direct_extract_value` (the
    ``direct_extractor`` hook of operators.extract). ``anchors`` maps
    field -> discovered anchor for this label."""
    anchor = re.escape(_anchor_for(field, anchors))
    boundary = _boundary_lookahead(field, all_fields, anchors)
    pat = compile_cached(rf"(?i){anchor}[\s:\-]*([\s\S]*?){boundary}", re.DOTALL)
    out = texts.str.extract(pat, expand=True).iloc[:, 0].str.strip()
    return out.where(out.notna(), None)


# ---------------------------------------------------------------------------
# Corpus-driven anchor discovery (the LLM's "read the label off the page"
# capability, deterministically)
# ---------------------------------------------------------------------------

_SEP_CHARS = ":-"


def _fold(s: str) -> str:
    """Accent-fold + lowercase for lexical matching (nome == Nomé)."""
    return "".join(
        c for c in unicodedata.normalize("NFD", s.lower())
        if not unicodedata.combining(c)
    )


def _clean_token(tok: str) -> str:
    return tok.strip(_SEP_CHARS)


def _context_tokens(ctx: str) -> list[str]:
    return [t for t in (_clean_token(x) for x in ctx.split()) if t]


def _token_sim(field_tokens: list[str], gram_tokens: list[str]) -> float:
    """Mean over field tokens of the best fuzzy match to any gram token.
    SequenceMatcher handles cross-language near-misses (nome ~ name: 0.75)."""
    if not field_tokens or not gram_tokens:
        return 0.0
    total = 0.0
    for ft in field_tokens:
        total += max(SequenceMatcher(None, ft, gt).ratio() for gt in gram_tokens)
    return total / len(field_tokens)


def _occurs(anchor: str, texts: list[str], min_frac: float = 0.3) -> bool:
    """Anchor candidates are built from separator-stripped tokens, so a
    multi-token candidate may not exist literally in any document (label
    printed as "Nome - Completo" yields candidate "Nome Completo"). The
    rule matcher anchors on the literal string — reject candidates that
    don't actually occur in enough sample texts."""
    if not texts:
        return False
    hits = sum(1 for t in texts if anchor in t)
    return hits >= max(1, int(min_frac * len(texts)))


def _gram_conflicts(gram: str, taken: set[str]) -> bool:
    g = f" {gram} "
    for t in taken:
        tt = f" {t} "
        if g in tt or tt in g:
            return True
    return False


def discover_label_anchors(
    fields: list[str],
    descriptions: dict[str, str],
    texts: list[str],
    expected_maps: list[Optional[dict]],
    min_const_frac: float = 0.6,
    min_sim: float = 0.6,
    max_anchor_tokens: int = 4,
) -> list[dict]:
    """Mine per-field anchors (rendered labels) from a sample of one label's
    normalized texts. Deterministic recast of what the reference's LLM does
    by reading the page (src/pipeline.py:72-143): the schema names a field
    ``nome`` but the document prints "Nome Completo:" or "Name" — the rule
    must anchor on what is printed, not on the schema name.

    Two evidence sources, strongest first:

    * **expected** — where ground-truth values are available (reference
      datasets carry ``expected_answer`` per doc, src/data.py:103-121):
      count the token n-grams immediately preceding each value occurrence;
      the rendered label is constant across documents while surrounding
      values vary, so it dominates the counts. The longest n-gram within
      5% of the best count wins (captures multi-token labels like
      "Nome Completo" without over-extending into variable context).
    * **similarity** — without ground truth: template constants are token
      n-grams with high document frequency (labels repeat; values vary).
      Each remaining field greedily claims the constant n-gram most
      lexically similar (accent-folded fuzzy token match) to its name or
      schema description.

    Fields with neither kind of evidence fall back to the title-cased
    default. Returns one row per field:
    ``{"field", "anchor", "source", "score"}`` with source in
    {"expected", "similarity", "default"}. Fully deterministic: all ties
    break on (token count desc, length desc, lexicographic).
    """
    # filter empty texts TOGETHER with their expected maps (zipping a
    # filtered text list against the unfiltered maps would misalign every
    # document after the first empty one — e.g. an undecoded PDF)
    paired = [
        (t, m) for t, m in zip(texts, expected_maps) if t
    ]
    texts = [t for t, _ in paired]
    expected_maps = [m for _, m in paired]
    result: dict[str, tuple[str, str, float]] = {}

    # -- expected-value evidence --------------------------------------------
    # Per field: an ORDERED candidate list (best first). Assignment happens
    # globally afterwards so no two DISCOVERED anchors are identical or
    # nested (which would put each field's anchor inside the other's
    # boundary lookahead and truncate both captures to null). Known
    # limitation: a no-evidence field's title-cased DEFAULT can still nest
    # with a discovered anchor (e.g. fields `nome` + `nome_completo` under
    # prefix-shared labels); the mined-rule three-checks and the validation
    # keyword lookahead are the safety net there — a contaminated rule
    # fails validation rather than shipping.
    exp_candidates: dict[str, list[tuple[str, float]]] = {}
    for f in fields:
        cands: Counter = Counter()
        n_ex = 0
        for text, exp in zip(texts, expected_maps):
            if not exp:
                continue
            v = exp.get(f)
            if not v:
                continue
            nv = normalize_text(v)
            if not nv:
                continue
            start, occ = 0, 0
            found = False
            while occ < 4:
                pos = text.find(nv, start)
                if pos < 0:
                    break
                occ += 1
                start = pos + 1
                found = True
                toks = _context_tokens(text[max(0, pos - 80):pos])
                for n in range(1, max_anchor_tokens + 1):
                    if len(toks) >= n:
                        cands[" ".join(toks[-n:])] += 1
            if found:
                n_ex += 1
        if not cands:
            continue
        best = max(cands.values())
        if best < max(2, n_ex // 2) and n_ex > 1:
            continue  # no stable preceding label across examples
        eligible = sorted(
            (c for c, k in cands.items() if k >= 0.95 * best),
            key=lambda c: (-len(c.split()), -len(c), c),
        )
        score = best / n_ex if n_ex else 0.0
        exp_candidates[f] = [(c, score) for c in eligible]

    taken: set[str] = set()
    for f in sorted(
        exp_candidates, key=lambda f: (-exp_candidates[f][0][1], f)
    ):
        for anchor, score in exp_candidates[f]:
            if _occurs(anchor, texts) and not _gram_conflicts(anchor, taken):
                result[f] = (anchor, "expected", score)
                taken.add(anchor)
                break
        # no conflict-free candidate -> fall through to similarity/default

    # -- constant-n-gram + lexical-similarity evidence ------------------------
    need = [f for f in fields if f not in result]
    if need and texts:
        df_counter: Counter = Counter()
        for text in texts:
            toks = _context_tokens(text)
            grams = set()
            for n in range(1, max_anchor_tokens + 1):
                for i in range(len(toks) - n + 1):
                    grams.add(" ".join(toks[i:i + n]))
            for g in grams:
                df_counter[g] += 1
        min_df = min_const_frac * len(texts)
        constants = sorted(
            g
            for g, c in df_counter.items()
            if c >= min_df and g and _occurs(g, texts)
        )
        taken = {a for a, _, _ in result.values()}
        scored = []
        for f in need:
            ftoks = [_fold(t) for t in f.split("_") if t]
            desc = descriptions.get(f) or ""
            dtoks = [_fold(t) for t in re.findall(r"\w+", desc)]
            for g in constants:
                if _gram_conflicts(g, taken):
                    continue
                gtoks = [_fold(t) for t in g.split()]
                # Field names are short identifiers: every name token should
                # appear in the label (forward). Descriptions are sentences:
                # every label token should appear in the description
                # (reverse, discounted — weaker evidence than the name).
                sc = max(
                    _token_sim(ftoks, gtoks),
                    0.8 * _token_sim(gtoks, dtoks) if dtoks else 0.0,
                )
                if sc >= min_sim:
                    scored.append((sc, f, g))
        scored.sort(key=lambda x: (-x[0], x[1], -len(x[2].split()), -len(x[2]), x[2]))
        assigned: set[str] = set()
        used: set[str] = set()
        for sc, f, g in scored:
            if f in assigned or _gram_conflicts(g, used | taken):
                continue
            assigned.add(f)
            used.add(g)
            result[f] = (g, "similarity", sc)

    rows = []
    for f in fields:
        anchor, source, score = result.get(f, (field_anchor(f), "default", 0.0))
        rows.append(
            {"field": f, "anchor": anchor, "source": source, "score": float(score)}
        )
    return rows


def make_discover_fn(max_texts: int = 128):
    """Grouped applyInPandas body for anchor discovery: one label group in
    (columns: doc_id, label, norm_text, schema_fields, expected), one anchor
    row per schema field out (ANCHOR_DDL)."""

    def discover_group(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["label", "field", "anchor", "source", "score"]
        if len(pdf) == 0:
            return pd.DataFrame(columns=cols)
        pdf = pdf.sort_values("doc_id").head(max_texts)
        label = pdf["label"].iloc[0]
        schema = list(pdf["schema_fields"].iloc[0])
        fields = [s["name"] for s in schema]
        descriptions = {s["name"]: (s.get("description") or "") for s in schema}
        expected_maps = [
            {e["name"]: e["value"] for e in exp} if exp is not None else None
            for exp in pdf["expected"]
        ]
        rows = discover_label_anchors(
            fields, descriptions, list(pdf["norm_text"]), expected_maps
        )
        return pd.DataFrame(
            [{"label": label, **r} for r in rows], columns=cols
        )

    return discover_group


# ---------------------------------------------------------------------------
# Keyword-contamination guard (standalone flag form)
# ---------------------------------------------------------------------------


def keyword_guard_pattern(
    field: str, all_fields: Iterable[str], anchors: Optional[dict] = None
):
    """Compiled word-boundary, case-insensitive pattern matching any OTHER
    field's keyword — the reference's ``_validate_no_other_keywords``
    (src/rule.py:415-467; defined but disabled at :235-241). Keywords are
    the sibling's schema name (raw and space-joined) AND its rendered
    anchor: the boundary lookahead already stops captures at sibling
    anchors, so the contamination this catches is a sibling's *name*
    appearing as content inside a value (e.g. anchors discovered under
    different printed labels). Returns None when the field has no
    siblings."""
    kws = set()
    for f in all_fields:
        if f == field:
            continue
        kws.add(re.escape(_anchor_for(f, anchors)))
        kws.add(re.escape(f))
        kws.add(re.escape(f.replace("_", " ")))
    others = sorted(kws, key=len, reverse=True)
    if not others:
        return None
    return compile_cached(rf"(?i)\b(?:{'|'.join(others)})\b", 0)


def validate_no_other_keywords(
    value: Optional[str],
    field: str,
    all_fields: Iterable[str],
    anchors: Optional[dict] = None,
) -> bool:
    """True iff ``value`` contains no other field's keyword. Standalone,
    default-OFF validation predicate (PipelineConfig.keyword_guard) — the
    always-on protection is the negative lookahead baked into mined
    validation regexes below; this flag additionally rejects contaminated
    slow-path example values before shape induction, matching what the
    reference's disabled check would have done."""
    if not value:
        return True
    pat = keyword_guard_pattern(field, all_fields, anchors)
    return pat is None or pat.search(value) is None


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
    anchors: Optional[dict] = None,
    keyword_guard: bool = False,
) -> list[MinedRule]:
    """Mine up to two rules (value + null) for one (label, field) group.
    ``anchors`` maps field -> discovered rendered label for this label
    (:func:`discover_label_anchors`); absent fields use the default.
    ``keyword_guard``: additionally drop slow-path example values containing
    another field's keyword (reference's disabled check; default off)."""
    texts = [t for t in texts if t][:max_examples]
    if not texts:
        return []
    anchor = re.escape(_anchor_for(field, anchors))
    boundary = _boundary_lookahead(field, all_fields, anchors)

    # Slow-path extraction over the group's examples.
    examples = []
    for t in texts:
        v = direct_extract_value(t, field, all_fields, anchors)
        if v is not None:
            if keyword_guard and not validate_no_other_keywords(
                v, field, all_fields, anchors
            ):
                continue
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
            {re.escape(_anchor_for(f, anchors)) for f in all_fields if f != field},
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


def make_miner_fn(
    min_pass_rate: float = 0.9,
    max_examples: int = 64,
    anchors: Optional[dict] = None,
    keyword_guard: bool = False,
):
    """Grouped applyInPandas body: one (label, field) group in, zero or more
    mined-rule rows out. Group payload columns: doc_id, label, field,
    norm_text, all_fields (for boundary anchors). ``anchors`` maps
    (label, field) -> discovered anchor (driver-collected, KB-scale — ships
    in the closure). Examples are sorted by doc_id before truncation so the
    mined rule is independent of shuffle/partition arrival order
    (deterministic-replay contract, plans/checkpoint.py)."""

    def mine_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(columns=[
                "label", "field", "rule", "validation_regex", "kind",
                "support", "pass_rate",
            ])
        pdf = pdf.sort_values("doc_id")
        label = pdf["label"].iloc[0]
        field = pdf["field"].iloc[0]
        all_fields = list(pdf["all_fields"].iloc[0])
        label_anchors = (
            {f: a for (lbl, f), a in anchors.items() if lbl == label}
            if anchors
            else None
        )
        mined = mine_field_rules(
            label,
            field,
            all_fields,
            list(pdf["norm_text"]),
            min_pass_rate=min_pass_rate,
            max_examples=max_examples,
            anchors=label_anchors,
            keyword_guard=keyword_guard,
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
