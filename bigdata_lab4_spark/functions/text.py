"""Text-cleaning column expressions.

The reference cleans tweets with a row-at-a-time python function
(`/root/reference/src/utils.py:5-10`, applied via ``pandas.apply`` at
`src/preprocess.py:48`): strip URLs, @mentions, #hashtags, delete all
of ``string.punctuation``, lowercase, strip. Here the same semantics
are pure Catalyst column expressions — JVM-side, whole-stage
codegen'd, no Python in the hot path. Golden I/O pairs from
`src/unit_tests/test_utils.py:8-21` are the contract (tests/).
"""

from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Python's ``string.punctuation`` — the exact 32-char set the
#: reference deletes (`/root/reference/src/utils.py:9`).
PUNCTUATION: str = string.punctuation


def clean_text_col(c: Column | str, ascii_only: bool = False) -> Column:
    """Spark-native ``clean_text``.

    Matches the reference order of operations exactly: URLs →
    mentions → hashtags → punctuation deletion → lower → strip.

    ``ascii_only=True`` keeps regexes RE2-compatible (ASCII ``\\w``)
    so the identical expression can be mirrored in the DuckDB oracle;
    the default uses Java's ``(?U)`` to match Python's unicode-aware
    ``\\w`` (CPython ``re`` semantics, which the reference relies on).
    """
    c = F.col(c) if isinstance(c, str) else c
    if ascii_only:
        word, sp, nsp = r"\w", r"\s", r"\S"
    else:
        # CPython's unicode classes, spelled out for Java's engine
        # (Java's (?U)\w/\s are close but NOT equal — fuzzed in
        # tests/test_text_properties.py):
        #   \w = isalnum ∪ {_} = L* ∪ N* (incl. No/Nl: '²', 'Ⅷ') ∪ _
        #        but NOT marks (Java (?U)\w adds Mn/Mc/Me) and NOT
        #        other connectors (Java adds all of Pc);
        #   \s = White_Space ∪ \x1c-\x1f (bidi separators Python
        #        counts as space, Java does not).
        word = r"[\p{L}\p{N}_]"
        sp = r"[\s\x1c-\x1f\x85]"
        nsp = r"[^\s\x1c-\x1f\x85]"
    # (?U) makes Java \s match unicode White_Space (NBSP etc.); the
    # ascii_only branch skips it so the same pattern stays RE2-valid
    # for the DuckDB oracle mirror.
    flags = "" if ascii_only else "(?U)"
    c = F.regexp_replace(c, f"{flags}http{nsp}+|www{nsp}+", "")
    c = F.regexp_replace(c, f"{flags}@{word}+", "")
    c = F.regexp_replace(c, f"{flags}#{word}+", "")
    # translate() deletes chars with no replacement — same semantics
    # as str.translate(maketrans("", "", punctuation)); stays in
    # codegen, no regex engine needed for the 32-char class.
    c = F.translate(c, PUNCTUATION, "")
    c = F.lower(c)
    # Python .strip() removes all whitespace (space/tab/newline...),
    # Spark trim() only ' ' — use a regex trim for exact parity.
    c = F.regexp_replace(c, f"{flags}^{sp}+|{sp}+$", "")
    return c


def tokens_col(c: Column | str) -> Column:
    """Whitespace tokenization with empty tokens dropped — the shape
    shared by the TF/IDF queries and the text-analysis operators."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")
