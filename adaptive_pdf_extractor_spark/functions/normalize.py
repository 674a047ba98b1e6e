"""Text normalization — behavioral parity with the reference's
``normalize_text`` (reference: src/data.py:51-95).

The reference canonicalizes noisy OCR text in six steps; extraction rules
are learned **against the normalized form**, so the engine must reproduce it
byte-for-byte. Two deliberate properties of the reference that we preserve:

* Letter/digit and word-boundary splits use **ASCII** classes
  (``[a-zA-Z]``, ``[a-z]``, ``[A-Z]``): accented characters (``ç``, ``ª``,
  ``É`` ...) do NOT trigger splits.
* The final ``" ".join(text.split())`` collapses ALL whitespace (including
  newlines) to single spaces — output is always single-line.

One regex engine end-to-end: CPython ``re`` (via pandas ``str.replace``
which uses the same engine), never JVM ``regexp_replace`` — the learned
rules are Python-``re`` patterns and Java regex semantics differ (inline
flags, Unicode classes).
"""

from __future__ import annotations

import re

import pandas as pd

# Precompiled steps (reference: src/data.py:73-92).
_LETTER_DIGIT = re.compile(r"([a-zA-Z])(\d)")
_DIGIT_LETTER = re.compile(r"(\d)([a-zA-Z])")
_LOWER_UPPER = re.compile(r"([a-z])([A-Z])")
_UPPER_UPPERLOWER = re.compile(r"([A-Z])([A-Z][a-z])")
_SPACES_TABS = re.compile(r"[ \t]+")
_NEWLINES = re.compile(r"\n+")


def normalize_text(text: str | None) -> str | None:
    """Normalize one string. Exact reference semantics (src/data.py:51-95)."""
    if text is None:
        return None
    text = _LETTER_DIGIT.sub(r"\1 \2", text)
    text = _DIGIT_LETTER.sub(r"\1 \2", text)
    text = _LOWER_UPPER.sub(r"\1 \2", text)
    text = _UPPER_UPPERLOWER.sub(r"\1 \2", text)
    text = _SPACES_TABS.sub(" ", text)
    text = _NEWLINES.sub("\n", text)
    text = " ".join(text.split())
    return text.strip()


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized normalization of a pandas string Series.

    pandas ``str.replace(regex=True)`` dispatches to CPython ``re`` so the
    result is identical to :func:`normalize_text` element-wise; nulls pass
    through as nulls.
    """
    s = s.astype("object")
    mask = s.notna()
    t = s[mask].astype(str)
    t = t.str.replace(_LETTER_DIGIT, r"\1 \2", regex=True)
    t = t.str.replace(_DIGIT_LETTER, r"\1 \2", regex=True)
    t = t.str.replace(_LOWER_UPPER, r"\1 \2", regex=True)
    t = t.str.replace(_UPPER_UPPERLOWER, r"\1 \2", regex=True)
    # steps 3-5 fuse into one pass: any whitespace run -> single space
    # (step 5's " ".join(split()) subsumes steps 3 and 4 for the final
    # value; splits above already inserted plain spaces)
    t = t.str.split().str.join(" ").str.strip()
    out = s.copy()
    out[mask] = t
    return out
