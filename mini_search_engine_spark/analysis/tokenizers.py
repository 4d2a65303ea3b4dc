"""Plain-Python tokenizer/analyzer kernels.

These are the single-value kernels; the Spark column surface wraps them in
Arrow-vectorized UDFs (``analysis/udfs.py``) or replaces them with native
Catalyst expressions where possible. They also run driver-side to analyze
query strings (queries are tiny — no reason to ship them to executors).

Reference semantics:
* punctuation tokenizer — ``analysis/PunctuationTokenizer.java:20-58``:
  trim → lowercase → split on the class ``[,.;?! ^\\f\\n\\r\\t\\v]``
  (the ``^`` is a LITERAL caret) → drop empties → drop the fixed
  127 stopwords.
* naive tokenizer — ``analysis/NaiveAnalyzer.java:13-15``:
  ``text.toLowerCase().split("\\s+")`` (no trim / stopwords / stemming).
* word-break tokenizer — ``analysis/WordBreakTokenizer.java:36-134``:
  DP maximizing the product of unigram probabilities; case-insensitive;
  stopwords removed from the result; raises if unbreakable.
* composed analyzer — ``analysis/ComposableAnalyzer.java:21-23``:
  tokenize, then stem each token.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

from mini_search_engine_spark.analysis.porter import porter_stem
from mini_search_engine_spark.analysis.stopwords import STOP_WORDS

# Literal caret and \v (\x0b) intentionally inside the class — see reference.
PUNCT_SPLIT_RE = re.compile(r"[,.;?! ^\f\n\r\t\x0b]")
# Java String.trim removes every char ≤ U+0020 from both ends — NOT the same
# set as Python str.strip() (all Unicode whitespace, e.g. NBSP, but not
# control chars ≤ 0x08) or Spark F.trim (the single space char). Every
# tokenization path — this kernel, the native Catalyst column, the fused
# Arrow build kernel — trims exactly this set so dl/terms agree everywhere.
JAVA_TRIM_CHARS = "".join(chr(i) for i in range(0x21))
# The same pattern for engines that take a regex string (Spark F.split, DuckDB).
PUNCT_SPLIT_PATTERN = "[,.;?! ^\\f\\n\\r\\t\\x0B]"

NAIVE_SPLIT_RE = re.compile(r"\s+")

# Code-aware tokenization (BASELINE.json north_star: "code-aware
# tokenization … over a table of source repos"). Spec shared verbatim by
# three engines — this Python kernel (queries/tests), the Catalyst column
# (`udfs._code_tokens_native`, build hot path: three regexp_replace +
# lower + split, whole-stage codegen, zero Python), and the DuckDB oracle
# (`__spark_entry__.oracle_sql`). Two boundary rules then a split:
#   1. ACRONYM|Word   "HTTPServer"  -> "HTTP Server"   ([A-Z]+)([A-Z][a-z])
#   2. lower|Upper    "getUser42X"  -> "getUser42 X"   ([a-z0-9])([A-Z])
#   3. lowercase, split on [^a-z0-9]+ (kills '_', '.', '(' …), drop empties
# Subtokens ONLY (no whole-identifier dual emission): keeps tf == dl and
# positions a plain sequence. No stopword removal — 'return'/'import' are
# legitimate code search terms.
CODE_BOUNDARY_1 = "([A-Z]+)([A-Z][a-z])"
CODE_BOUNDARY_2 = "([a-z0-9])([A-Z])"
CODE_SPLIT_PATTERN = "[^a-z0-9]+"
_CODE_B1_RE = re.compile(CODE_BOUNDARY_1)
_CODE_B2_RE = re.compile(CODE_BOUNDARY_2)
_CODE_SPLIT_RE = re.compile(CODE_SPLIT_PATTERN)


def code_tokenize(text: str | None) -> list[str]:
    """camelCase/snake_case-aware subtoken stream: ``parseHTTPResponse_v2``
    → ``['parse', 'http', 'response', 'v2']``."""
    if not text:
        return []
    s = _CODE_B1_RE.sub(r"\1 \2", text)
    s = _CODE_B2_RE.sub(r"\1 \2", s)
    return [t for t in _CODE_SPLIT_RE.split(s.lower()) if t]


def punctuation_tokenize(text: str | None) -> list[str]:
    if not text:
        return []
    toks = PUNCT_SPLIT_RE.split(text.strip(JAVA_TRIM_CHARS).lower())
    return [t for t in toks if t and t not in STOP_WORDS]


def naive_tokenize(text: str | None) -> list[str]:
    if text is None:
        return []
    # Java split("\s+") emits a leading "" for leading whitespace and
    # returns [""] for the empty string; downstream posting build ignores
    # empty terms, so we drop empties here for a cleaner surface.
    return [t for t in NAIVE_SPLIT_RE.split(text.lower()) if t]


class WordBreakError(ValueError):
    """Raised when the input cannot be segmented with the dictionary
    (reference throws RuntimeException, ``WordBreakTokenizer.java:107-109``)."""


def load_frequency_dict(lines) -> dict[str, float]:
    """Parse ``word freq`` lines into a probability dict (freq / total).

    Matches ``WordBreakTokenizer.initDict`` (``WordBreakTokenizer.java:65-90``):
    lines that don't split into exactly two space-separated fields are
    skipped (this also drops a UTF-8 BOM-only first line, as Java's
    ``String.trim`` leaves U+FEFF in place and the length-2 check rejects it).
    """
    freqs: dict[str, float] = {}
    total = 0.0
    for line in lines:
        parts = line.strip().split(" ")
        if len(parts) != 2:
            continue
        f = float(parts[1])
        freqs[parts[0]] = f
        total += f
    return {w: f / total for w, f in freqs.items()}


def load_frequency_dict_file(path) -> dict[str, float]:
    with open(path, encoding="utf-8") as fh:
        return load_frequency_dict(fh)


def prepare_logprob_dict(prob_dict: dict[str, float]) -> tuple[dict[str, float], int]:
    """Precompute (log-prob dict, max word length) ONCE — the DP kernel must
    never rebuild this per row (with the reference's 82k-entry dictionary
    that would be 82k ``math.log`` calls per document)."""
    logp = {w: math.log(p) for w, p in prob_dict.items()}
    max_word = max((len(w) for w in logp), default=0)
    return logp, max_word


def word_break_logp(
    text: str | None, logp: dict[str, float], max_word: int
) -> list[str]:
    """DP word-break maximizing sum of log-probabilities (= max product).

    Reference: ``WordBreakTokenizer.tokenize/breakWord``
    (``WordBreakTokenizer.java:94-160``) — case-insensitive, trims, DP over
    the dictionary, stopwords filtered AFTER segmentation (so stopwords
    still participate in the DP), unbreakable input raises.
    """
    if not text:
        return []
    s = text.strip(JAVA_TRIM_CHARS).lower()  # Java String.trim semantics
    n = len(s)
    if n == 0:
        return []
    # best[i] = max sum of log probs segmenting s[i:]; back[i] = split point
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [-1] * (n + 1)
    best[n] = 0.0
    for i in range(n - 1, -1, -1):
        hi = min(n, i + max_word)
        for j in range(i + 1, hi + 1):
            w = s[i:j]
            lp = logp.get(w)
            if lp is not None and best[j] != NEG:
                cand = lp + best[j]
                if cand > best[i]:
                    best[i] = cand
                    back[i] = j
    if best[0] == NEG:
        raise WordBreakError(f"Can't break this word: {text!r}")
    out: list[str] = []
    i = 0
    while i < n:
        j = back[i]
        tok = s[i:j]
        if tok not in STOP_WORDS:
            out.append(tok)
        i = j
    return out


def word_break_tokenize(text: str | None, prob_dict: dict[str, float]) -> list[str]:
    """Single-call convenience wrapper; batch paths must use
    ``prepare_logprob_dict`` + ``word_break_logp`` to hoist the log pass."""
    logp, max_word = prepare_logprob_dict(prob_dict)
    return word_break_logp(text, logp, max_word)


@lru_cache(maxsize=1 << 16)
def _stem_cached(tok: str) -> str:
    return porter_stem(tok)


def analyze(text: str | None, tokenizer: str = "punctuation", stem: bool = True) -> list[str]:
    """Composed analyzer (tokenize → stem each token), driver-side kernel."""
    if tokenizer == "punctuation":
        toks = punctuation_tokenize(text)
    elif tokenizer == "naive":
        toks = naive_tokenize(text)
    elif tokenizer == "code":
        toks = code_tokenize(text)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    if stem:
        toks = [_stem_cached(t) for t in toks]
    return toks
