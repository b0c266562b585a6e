"""Pure text functions shared by the Spark UDFs, the oracle, and the tests.

Single source of truth for the per-row invariants BASELINE.json pins:
extract_text must be byte-identical per url between the Spark pipeline and
the single-process oracle — both call these exact functions.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# --------------------------------------------------------------------------
# HTML → text (north_rule: "extract text byte-identically per url")
# --------------------------------------------------------------------------

_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(rb"[ \t\r\n]+")
_BLOCK_RE = re.compile(
    rb"<(?:script|style)\b[^>]*>.*?</(?:script|style)>", re.DOTALL | re.IGNORECASE
)
# &amp; decodes LAST: replacing it first would turn a literal "&amp;lt;"
# (source text containing the string "&lt;") into "&lt;" and then a second
# pass would double-unescape it to "<"
_ENTITIES = {
    b"&lt;": b"<",
    b"&gt;": b">",
    b"&quot;": b'"',
    b"&#39;": b"'",
    b"&nbsp;": b" ",
    b"&amp;": b"&",
}


def extract_text(html: bytes) -> str:
    """Deterministic boilerplate-stripping text extractor over raw HTML bytes.

    Contract: for fixture pages (FIXTURES.md §1: text wrapped in
    ``<p>…</p>`` boilerplate) the output equals the original ``text``
    byte-for-byte. Kept dependency-free (no bs4 in the sandbox) and simple
    enough to be provably deterministic across Arrow round-trips (utf-8 all
    the way)."""
    if html is None:
        return ""
    b = bytes(html)
    b = _BLOCK_RE.sub(b" ", b)
    # drop <head>…</head> wholesale (titles are boilerplate, not body text)
    b = re.sub(rb"<head\b[^>]*>.*?</head>", b" ", b, flags=re.DOTALL | re.IGNORECASE)
    b = _TAG_RE.sub(b" ", b)
    for ent, rep in _ENTITIES.items():
        b = b.replace(ent, rep)
    b = _WS_RE.sub(b" ", b).strip()
    return b.decode("utf-8", errors="replace")


def sha256_text(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# sentence splitting (deterministic, language-agnostic)
# --------------------------------------------------------------------------

_SENT_RE = re.compile(r"[^.!?]+[.!?]?")

#: tagger tensors are [batch, maxlen]; cap sentence length like the
#: reference's break2subsents (ref:src/utils.py:~100-140, SURVEY §2.2 P5)
MAX_SENT_CHARS = 2048


def _split_long(sent: str, max_len: int) -> list[str]:
    """Deterministically split an over-long sentence at the last space
    before max_len (hard cut when spaceless)."""
    out = []
    while len(sent) > max_len:
        cut = sent.rfind(" ", 1, max_len)
        if cut <= 0:
            cut = max_len
        out.append(sent[:cut].strip())
        sent = sent[cut:].strip()
    if sent:
        out.append(sent)
    return out


def split_sentences(text: str, max_len: int = MAX_SENT_CHARS) -> list[str]:
    """Split on . ! ? keeping the terminator; strip outer whitespace;
    over-long sentences are sub-split (shared by oracle and Spark UDFs,
    so offsets stay consistent on both sides)."""
    sents = [m.group(0).strip() for m in _SENT_RE.finditer(text) if m.group(0).strip()]
    if max_len and any(len(s) > max_len for s in sents):
        sents = [c for s in sents for c in _split_long(s, max_len)]
    return sents


# --------------------------------------------------------------------------
# surface normalization + char n-grams + MinHash (linking stage)
# --------------------------------------------------------------------------

_NORM_RE = re.compile(r"[^a-z0-9 ]+")


def normalize_surface(s: str) -> str:
    """Lowercase, strip punctuation, squeeze whitespace."""
    s = s.lower()
    s = _NORM_RE.sub(" ", s)
    return " ".join(s.split())


def char_ngrams(s: str, n: int = 3) -> set[str]:
    """Padded char n-grams of the normalized surface."""
    s = f"#{s}#"
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


# MinHash: k universal hash perms h_i(x) = (a_i*x + b_i) mod p, banded LSH.
# b=8, r=2 ⇒ P(candidate | jaccard=0.5) ≈ 1-(1-0.25)^8 ≈ 0.90 — sized for
# typo-level similarity; candidates are exact-Jaccard-verified afterwards.
# p = 2^31-1 with 31-bit operands: a*x+b < 2^62 stays exact in int64 (the
# earlier 61-bit p silently wrapped np.outer past int64, so the computed
# function was not the stated universal family and carried no min-wise
# independence guarantee).
MINHASH_K = 16
MINHASH_BANDS = 8
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
_MERSENNE = (1 << 31) - 1
_rng = np.random.RandomState(20160731)  # CharNER COLING-2016 vintage seed
_MH_A = _rng.randint(1, _MERSENNE, size=MINHASH_K, dtype=np.int64)
_MH_B = _rng.randint(0, _MERSENNE, size=MINHASH_K, dtype=np.int64)


def _hash_token(tok: str) -> int:
    return int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")


def minhash_signature(grams: set[str]) -> np.ndarray:
    """k-wide MinHash signature (int64) of a set of n-grams."""
    if not grams:
        return np.zeros(MINHASH_K, dtype=np.int64)
    xs = np.fromiter((_hash_token(g) for g in grams), dtype=np.uint64)
    xs = xs.astype(np.int64) & _MERSENNE
    # (k, |grams|) matrix of hashes, min over grams — exact: |a*x+b| < 2^62
    hv = (np.outer(_MH_A, xs) + _MH_B[:, None]) % _MERSENNE
    return hv.min(axis=1).astype(np.int64)


def minhash_bands(surface: str) -> list[int]:
    """LSH band hashes (one int per band) for a mention/alias surface."""
    sig = minhash_signature(char_ngrams(normalize_surface(surface)))
    out = []
    for b in range(MINHASH_BANDS):
        chunk = sig[b * MINHASH_ROWS : (b + 1) * MINHASH_ROWS].tobytes()
        h = hashlib.blake2b(chunk, digest_size=8).digest()
        out.append(int.from_bytes(h, "big", signed=True))
    return out


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)

