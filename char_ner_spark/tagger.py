"""Character-level mention tagger: stacked BiLSTM forward + constrained Viterbi.

Re-expresses the reference's NN dataflow (ref:src/lazrnn.py:~40-230 RDNN,
ref:src/decoder.py:~5-80 ViterbiDecoder, ref:src/featchar.py featurization;
reconstructed — SURVEY.md §0) as pure batched NumPy so it runs identically

  (a) inside Spark's ``mapInPandas`` over Arrow record batches, and
  (b) single-process inside the oracle (charkg reference stand-in).

Design notes (SURVEY.md §2.9):
  - Weights are deterministic seeded constants per language (no training
    in scope; north_rule uses the tagger for inference). A hand-crafted
    feature bias channel is added to the BiLSTM logits so the tagger
    detects capitalized entity mentions on the fixture corpus — the BiLSTM
    matmul path is real and dominates compute, which is what the benchmark
    measures.
  - Per-row fp32 ops only, no cross-row reductions → bitwise-stable across
    batch composition and parallelism levels (local[8] vs local[32]).
  - Viterbi transitions are constrained so a word's chars keep one tag
    (tag changes only at space boundaries) — the reference's core decoding
    idea (ref:src/decoder.py:~40-80).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

from . import spans as S

CLASSES = ["O", "PER", "LOC", "ORG", "MISC"]
NC = len(CLASSES)
VOCAB = 512  # codepoints clamped to [0, 511]; covers en/de/es/nl fixtures
EMB_DIM = 16
HIDDEN = 16
LAYERS = 2
_LOGIT_SCALE = np.float32(0.05)  # seeded-BiLSTM contribution (deterministic noise)
BATCH_ROWS = 192  # max rows per LSTM batch — see L2-residency note below
_BIAS_ENT = np.float32(4.0)
_BIAS_O = np.float32(2.0)


# ---------------------------------------------------------------------------
# deterministic GEMM discipline
#
# The engine's correctness gates (golden-run hash equality, cross-
# parallelism bitwise stability, fixed-point confidences) require a row's
# logits to be a PURE FUNCTION OF ITS CONTENT — independent of which rows
# it was batched with, its position in the batch, and the padded length.
# Elementwise ufuncs give that for free (per-element IEEE ops). BLAS GEMM
# does not: OpenBLAS computes m-tail rows (m % microkernel) with a cleanup
# kernel whose k-accumulation order differs from the main kernel, and its
# threading splits change accumulation again — both observed to flip low
# bits on real hosts (AVX512 DYNAMIC_ARCH dispatch; see
# tests/test_tagger_kernels.py). Three-part discipline:
#
#   1. pin the in-process BLAS to ONE thread (ctypes, works even when
#      numpy loaded before us — env vars only help before first import);
#   2. pad every GEMM's row count to a multiple of _BLAS_PAD so every real
#      row takes the main kernel (the hot path's BATCH_ROWS is already a
#      multiple — the pad costs nothing there);
#   3. PROBE the host once (first kernel use): plant duplicate rows at
#      scattered positions, compare mult-of-pad slices and fused-vs-split
#      column blocks across every (k, N) the model uses. A host that
#      fails the probe falls back to `_det_gemm`, a k-ascending
#      elementwise accumulation that is shape-independent by construction
#      (slower; correctness never rests on the probe passing).
# ---------------------------------------------------------------------------

_BLAS_PAD = 32


def _pin_blas_single_thread() -> bool:
    """Force the ALREADY-LOADED OpenBLAS to one thread via its C API.
    Env vars (OPENBLAS_NUM_THREADS) only work before the library loads;
    inside a pyspark worker numpy is often imported first."""
    import ctypes

    done = False
    try:
        with open("/proc/self/maps") as fh:
            libs = sorted({
                line.split()[-1] for line in fh
                if "openblas" in line and ".so" in line and "/" in line
            })
    except OSError:
        return False
    for path in libs:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        for sym in ("openblas_set_num_threads64_",
                    "openblas_set_num_threads"):
            fn = getattr(lib, sym, None)
            if fn is not None:
                fn(1)
                done = True
    return done


def _det_gemm(A: np.ndarray, W: np.ndarray) -> np.ndarray:
    """[m,k] @ [k,N] with fixed k-ascending per-element accumulation —
    bitwise independent of m, batch composition, blocking and BLAS
    dispatch, because it is built ONLY from elementwise IEEE ops. The
    fallback path for hosts whose BLAS fails the row-stability probe."""
    m, k = A.shape
    out = np.multiply(A[:, 0:1], W[0], dtype=np.float32)
    tmp = np.empty_like(out)
    for kk in range(1, k):
        np.multiply(A[:, kk:kk + 1], W[kk], out=tmp)
        np.add(out, tmp, out=out)
    return out


_FAST_GEMM: bool | None = None  # resolved by the first _gemm_fast() call


def _probe_gemm_row_stable() -> bool:
    """Does this host's BLAS compute each GEMM row as a pure function of
    its content at every (k, N) the model uses (rows padded to
    _BLAS_PAD)? Runs in ~1 ms; large-m case included so an unpinned
    threaded split would be caught too."""
    rng = np.random.RandomState(0xC0FFEE)
    H = HIDDEN
    shapes = [(EMB_DIM, 4 * H), (EMB_DIM, 8 * H), (2 * H, 4 * H),
              (2 * H, 8 * H), (2 * H, NC)]
    for k, N in shapes:
        W = rng.normal(0, 0.1, (k, N)).astype(np.float32)
        X = rng.normal(0, 0.3, (2048, k)).astype(np.float32)
        for p in (33, 63, 257, 2047):  # duplicate content, scattered rows
            X[p] = X[0]
        full = X @ W
        if not all(np.array_equal(full[p], full[0])
                   for p in (33, 63, 257, 2047)):
            return False
        if not all(np.array_equal(X[:m] @ W, full[:m])
                   for m in (_BLAS_PAD, 64, 320)):
            return False
    # fused-vs-split column blocks: the bidir kernel multiplies against
    # concat([Wxf, Wxb]) while the reference uses each half alone
    Wa = rng.normal(0, 0.1, (EMB_DIM, 4 * H)).astype(np.float32)
    Wb = rng.normal(0, 0.1, (EMB_DIM, 4 * H)).astype(np.float32)
    X = rng.normal(0, 0.3, (64, EMB_DIM)).astype(np.float32)
    f = X @ np.concatenate([Wa, Wb], axis=1)
    if not (np.array_equal(f[:, :4 * H], X @ Wa)
            and np.array_equal(f[:, 4 * H:], X @ Wb)):
        return False
    # stacked 3D step matmul vs its 2D slices, with duplicate rows
    W2 = np.stack([rng.normal(0, 0.1, (H, 4 * H)).astype(np.float32)
                   for _ in range(2)])
    Hs = rng.normal(0, 0.3, (2, 64, H)).astype(np.float32)
    Hs[:, 47] = Hs[:, 2]
    b3 = np.matmul(Hs, W2)
    if not (np.array_equal(b3[0], Hs[0] @ W2[0])
            and np.array_equal(b3[1], Hs[1] @ W2[1])
            and np.array_equal(b3[:, 47], b3[:, 2])
            and np.array_equal(np.matmul(Hs[:, :32], W2), b3[:, :32])):
        return False
    return True


def _gemm_fast() -> bool:
    """Resolve (once) whether the padded-BLAS fast path is safe here.

    ``CHAR_NER_GEMM=det|fast`` overrides the probe. On a HETEROGENEOUS
    cluster the probe could resolve differently per host, making batch
    outputs host-dependent (each host is self-consistent, but a resumed
    or re-partitioned run could mix them); set ``CHAR_NER_GEMM=det`` via
    ``spark.executorEnv`` there to pin every executor to the
    accumulation-order-fixed path. Single-host / homogeneous fleets (the
    benched configuration) need no pin."""
    global _FAST_GEMM
    if _FAST_GEMM is None:
        import os

        forced = os.environ.get("CHAR_NER_GEMM", "").lower()
        if forced in ("det", "fast"):
            _FAST_GEMM = forced == "fast"
            if _FAST_GEMM:
                _pin_blas_single_thread()
            return _FAST_GEMM
        _pin_blas_single_thread()
        _FAST_GEMM = _probe_gemm_row_stable()
        if not _FAST_GEMM:
            import warnings

            warnings.warn(
                "host BLAS failed the GEMM row-stability probe; the tagger "
                "is using the deterministic elementwise GEMM fallback "
                "(bitwise-correct, slower)", RuntimeWarning)
    return _FAST_GEMM


def _gemm(A: np.ndarray, W: np.ndarray) -> np.ndarray:
    """Row-content-pure [m,k] @ [k,N]: padded single-threaded BLAS when the
    host probe passes, elementwise k-loop otherwise."""
    if not _gemm_fast():
        return _det_gemm(A, W)
    m = A.shape[0]
    pad = (-m) % _BLAS_PAD
    if pad:
        A = np.concatenate(
            [A, np.zeros((pad, A.shape[1]), dtype=np.float32)])
    return (A @ W)[:m]


def _step_matmul(h: np.ndarray, Wh: np.ndarray, out: np.ndarray) -> None:
    """Recurrent-step matmul ([..., n32, H] @ [..., H, 4H], n32 already a
    _BLAS_PAD multiple) → out; same fast/fallback dispatch as _gemm."""
    if _gemm_fast():
        np.matmul(h, Wh, out=out)
        return
    k = h.shape[-1]
    tmp = np.empty_like(out)
    np.multiply(h[..., 0:1], Wh[..., 0:1, :], out=out)
    for kk in range(1, k):
        np.multiply(h[..., kk:kk + 1], Wh[..., kk:kk + 1, :], out=tmp)
        np.add(out, tmp, out=out)


def _pad_batch(x: np.ndarray, mask: np.ndarray) -> tuple[np.ndarray,
                                                          np.ndarray, int]:
    """Zero-pad the BATCH axis to a _BLAS_PAD multiple (mask=True on pad
    rows keeps the all-valid fast path; pad rows compute discarded zeros
    and cannot perturb real rows — elementwise ops + row-stable GEMM)."""
    n = x.shape[0]
    pad = (-n) % _BLAS_PAD
    if not pad:
        return x, mask, n
    x = np.concatenate(
        [x, np.zeros((pad,) + x.shape[1:], dtype=x.dtype)])
    mask = np.concatenate([mask, np.ones((pad,) + mask.shape[1:], bool)])
    return x, mask, n


def _seed_for(lang: str) -> int:
    h = hashlib.blake2b(f"char-ner-spark:{lang}".encode(), digest_size=4).digest()
    return int.from_bytes(h, "big")


@lru_cache(maxsize=16)
def model_weights(lang: str) -> dict[str, np.ndarray]:
    """Deterministic per-language weight set (broadcast to executors).

    Layout mirrors a Lasagne stacked bi-LSTM param list
    (ref:src/lazrnn.py:~230-270 save/load; here seeded generation)."""
    rng = np.random.RandomState(_seed_for(lang))
    w: dict[str, np.ndarray] = {}
    w["emb"] = rng.normal(0, 0.1, (VOCAB, EMB_DIM)).astype(np.float32)
    din = EMB_DIM
    for layer in range(LAYERS):
        for d in ("fw", "bw"):
            w[f"Wx{layer}{d}"] = rng.normal(0, 0.08, (din, 4 * HIDDEN)).astype(np.float32)
            w[f"Wh{layer}{d}"] = rng.normal(0, 0.08, (HIDDEN, 4 * HIDDEN)).astype(np.float32)
            w[f"b{layer}{d}"] = np.zeros(4 * HIDDEN, dtype=np.float32)
        din = 2 * HIDDEN
    w["Wout"] = rng.normal(0, 0.08, (2 * HIDDEN, NC)).astype(np.float32)
    w["bout"] = np.zeros(NC, dtype=np.float32)
    # log-space transition prior (ref:src/decoder.py:~5-40 D8): mild penalty
    # for switching classes, bonus for staying
    trans = np.full((NC, NC), -0.5, dtype=np.float32)
    np.fill_diagonal(trans, 0.5)
    trans[0, :] = 0.0  # O → anything
    trans[:, 0] = 0.0  # anything → O
    w["trans"] = trans
    return w


def _lstm_dir(x: np.ndarray, mask: np.ndarray, Wx: np.ndarray, Wh: np.ndarray,
              b: np.ndarray, reverse: bool) -> np.ndarray:
    """One masked LSTM direction. x: [n, T, Din], mask: [n, T] bool → [n, T, H].

    At padded steps the state carries through unchanged (state stays exactly
    0 until the backward pass reaches a row's valid suffix), so each row's
    hidden stream is bitwise-identical to processing that row unpadded —
    batch composition and bucket padding cannot perturb results.

    This is the REFERENCE implementation: the hot path runs both directions
    through :func:`_lstm_bidir` (half the NumPy dispatch), and
    tests/test_tagger_kernels.py pins the two bitwise-equal."""
    x, mask, n_real = _pad_batch(x, mask)
    n, T, _ = x.shape
    H = Wh.shape[0]
    pre_all = _gemm(x.reshape(n * T, -1), Wx)  # one big GEMM, input path
    pre_all += b
    pre_all = pre_all.reshape(n, T, 4 * H)
    h = np.zeros((n, H), dtype=np.float32)
    c = np.zeros((n, H), dtype=np.float32)
    out = np.empty((n, T, H), dtype=np.float32)
    # preallocated scratch — no per-step allocations (large numpy temporaries
    # are mmap'd per op; the munmap TLB shootdowns wreck multi-worker scaling)
    g = np.empty((n, 4 * H), dtype=np.float32)
    c_new = np.empty((n, H), dtype=np.float32)
    h_new = np.empty((n, H), dtype=np.float32)
    tmp = np.empty((n, H), dtype=np.float32)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    all_valid = bool(mask.all())
    for t in steps:
        _step_matmul(h, Wh, g)
        g += pre_all[:, t, :]
        gates = g[:, : 3 * H]  # i|f|o fused sigmoid, in place
        np.negative(gates, out=gates)
        np.exp(gates, out=gates)
        gates += 1.0
        np.reciprocal(gates, out=gates)
        i, f, o = g[:, :H], g[:, H : 2 * H], g[:, 2 * H : 3 * H]
        u = g[:, 3 * H :]
        np.tanh(u, out=u)
        np.multiply(f, c, out=c_new)
        np.multiply(i, u, out=tmp)
        c_new += tmp
        np.tanh(c_new, out=tmp)
        np.multiply(o, tmp, out=h_new)
        if all_valid:
            c, c_new = c_new, c
            h, h_new = h_new, h
        else:
            m = mask[:, t : t + 1]
            np.copyto(c, c_new, where=m)
            np.copyto(h, h_new, where=m)
        out[:, t, :] = h
    return out[:n_real]


def _lstm_bidir(x: np.ndarray, mask: np.ndarray,
                Wxf: np.ndarray, Whf: np.ndarray, bf: np.ndarray,
                Wxb: np.ndarray, Whb: np.ndarray, bb: np.ndarray) -> np.ndarray:
    """Both directions of one bi-LSTM layer in a single step loop →
    [n, T, 2H] (fw in [..:H], bw in [..H:], matching the former
    ``concatenate([fw, bw])`` layout bitwise — pinned by
    tests/test_tagger_kernels.py against :func:`_lstm_dir`).

    At H=16 the per-step arrays are a few KB, so the loop cost is NumPy
    dispatch, not FLOPs (profiled: ~70% of the tag stage). Stacking the two
    directions' states as [2, n, H] halves the dispatch count: one batched
    ``np.matmul`` against [2, H, 4H] recurrent weights and one set of
    elementwise ops advance fw at time t and bw at time T-1-t together.
    The input projections of both directions fuse into one [n·T, Din] @
    [Din, 8H] GEMM. Masked-step carry-through semantics are identical to
    :func:`_lstm_dir` (state unchanged at padded steps; outputs written
    post-carry)."""
    x, mask, n_real = _pad_batch(x, mask)
    n, T, _ = x.shape
    H = Whf.shape[0]
    pre = _gemm(x.reshape(n * T, -1), np.concatenate([Wxf, Wxb], axis=1))
    pre += np.concatenate([bf, bb])
    pre = pre.reshape(n, T, 8 * H)
    Wh2 = np.stack([Whf, Whb])  # [2, H, 4H]
    h = np.zeros((2, n, H), dtype=np.float32)
    c = np.zeros((2, n, H), dtype=np.float32)
    out = np.empty((n, T, 2 * H), dtype=np.float32)
    g = np.empty((2, n, 4 * H), dtype=np.float32)
    c_new = np.empty((2, n, H), dtype=np.float32)
    h_new = np.empty((2, n, H), dtype=np.float32)
    tmp = np.empty((2, n, H), dtype=np.float32)
    all_valid = bool(mask.all())
    # per-step fast path: with length-sorted chunks most steps are valid
    # for EVERY row, and a where=all-True copyto ≡ the buffer swap — take
    # the 4-dispatch-cheaper swap whenever both directions' steps are
    # fully valid (bitwise-identical; ~4% on the bench corpus)
    valid_t = mask.all(axis=0)
    for t in range(T):
        tb = T - 1 - t
        _step_matmul(h, Wh2, g)
        g[0] += pre[:, t, : 4 * H]
        g[1] += pre[:, tb, 4 * H :]
        gates = g[:, :, : 3 * H]  # i|f|o fused sigmoid, in place
        np.negative(gates, out=gates)
        np.exp(gates, out=gates)
        gates += 1.0
        np.reciprocal(gates, out=gates)
        i, f, o = g[:, :, :H], g[:, :, H : 2 * H], g[:, :, 2 * H : 3 * H]
        u = g[:, :, 3 * H :]
        np.tanh(u, out=u)
        np.multiply(f, c, out=c_new)
        np.multiply(i, u, out=tmp)
        c_new += tmp
        np.tanh(c_new, out=tmp)
        np.multiply(o, tmp, out=h_new)
        if all_valid or (valid_t[t] and valid_t[tb]):
            c, c_new = c_new, c
            h, h_new = h_new, h
        else:
            mf = mask[:, t : t + 1]
            mb = mask[:, tb : tb + 1]
            np.copyto(c[0], c_new[0], where=mf)
            np.copyto(h[0], h_new[0], where=mf)
            np.copyto(c[1], c_new[1], where=mb)
            np.copyto(h[1], h_new[1], where=mb)
        out[:, t, :H] = h[0]
        out[:, tb, H:] = h[1]
    return out[:n_real]


def bilstm_logits(char_ids: np.ndarray, w: dict[str, np.ndarray],
                  mask: np.ndarray | None = None) -> np.ndarray:
    """Padded batch of char ids [n, T] (+ validity mask) → logits [n, T, NC]."""
    if mask is None:
        mask = np.ones(char_ids.shape, dtype=bool)
    x = w["emb"][char_ids]  # [n, T, D]
    for layer in range(LAYERS):
        x = _lstm_bidir(
            x, mask,
            w[f"Wx{layer}fw"], w[f"Wh{layer}fw"], w[f"b{layer}fw"],
            w[f"Wx{layer}bw"], w[f"Wh{layer}bw"], w[f"b{layer}bw"],
        )
    n, T, _ = x.shape
    # _gemm applies the full determinism discipline (row padding, pinned
    # single-thread BLAS, probed host, det fallback) — see the module-top
    # GEMM section; this narrow NC=5 projection was the first shape caught
    # depending on batch position, but hosts exist where EVERY sgemm shape
    # has m-tail instability, so the discipline is applied to all of them.
    out = _gemm(x.reshape(n * T, -1), w["Wout"])
    out += w["bout"]
    return out.reshape(n, T, NC)


def save_weights(lang: str, out_dir: str) -> str:
    """Persist a language's parameter set (ref:src/exper.py:~300-340
    save/load, SURVEY §2.1 S3 — npz instead of pickle)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"charner_{lang}.npz")
    np.savez(path, **model_weights(lang))
    return path


def load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# featurization (ref:src/featchar.py — char identity + capitalization)
# ---------------------------------------------------------------------------


def encode_chars(text: str) -> np.ndarray:
    """Char → clamped codepoint id (≡ one-hot row-select, SURVEY §2.2 P2)."""
    # '<u4' pins little-endian to match utf-32-le on any host byte order
    a = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    return np.minimum(a, VOCAB - 1)


#: the EXACT str.isspace() codepoint set (all 29 codepoints for which
#: Python's str.isspace() is True — pinned by tests/test_tagger_kernels.py
#: against the full Unicode range), as a lookup table: the hot loop
#: derives per-char space flags from the codepoint array it already
#: builds with two vector ops (~1µs vs ~4.4µs for the per-char Python
#: generator it replaces; round-6 perf, bitwise-identical results). The
#: largest space codepoint is 12288, so any codepoint clamped to 12289
#: reads a False slot.
_SPACE_CP = (9, 10, 11, 12, 13, 28, 29, 30, 31, 32, 133, 160, 5760,
             8192, 8193, 8194, 8195, 8196, 8197, 8198, 8199, 8200, 8201,
             8202, 8232, 8233, 8239, 8287, 12288)
_SPACE_LUT = np.zeros(12290, dtype=bool)
_SPACE_LUT[list(_SPACE_CP)] = True


def _word_class_hash(word: str) -> int:
    """Deterministic entity-class assignment for a capitalized word (1..4)."""
    h = hashlib.blake2b(word.lower().encode(), digest_size=2).digest()
    return 1 + (h[0] % (NC - 1))


_PUNCT = "\"'.,;:!?()[]"


def _parse_core(wtext: str) -> tuple[int, int, str, bool] | None:
    """Pure per-word piece of :func:`feature_bias`: (lead_offset, core_len,
    core, ends_run) for a capitalized-alpha word core, None otherwise.
    Factored out so the hot loop can memoize it per call — word forms are
    Zipf-distributed, so a small per-batch dict removes most of the
    strip/isupper/isalpha string work (round-6 perf; pure function, so
    results are unchanged by construction)."""
    core = wtext.strip(_PUNCT)
    if len(core) >= 2 and core[0].isupper() and core[1:].islower() and core.isalpha():
        lead = len(wtext) - len(wtext.lstrip(_PUNCT))
        # trailing punctuation inside the token ends the run ("Corp.,")
        # (wtext is a maximal non-whitespace run: never empty/padded)
        return (lead, len(core), core, wtext[-1] in _PUNCT)
    return None


def feature_bias(text: str,
                 offs: list[tuple[int, int]] | None = None,
                 core_cache: dict | None = None) -> np.ndarray:
    """Hand-crafted emission bias [T, NC]: capitalized multi-char alpha words
    push toward an entity class; everything else pushes toward O.

    ``offs`` may carry precomputed :func:`spans.word_offsets` output (the
    tagger hot loop computes it once per sentence and shares it here and
    with span extraction); ``core_cache`` an optional per-call memo for
    :func:`_parse_core` (same results either way)."""
    T = len(text)
    bias = np.zeros((T, NC), dtype=np.float32)
    bias[:, 0] = _BIAS_O
    # capitalized-word cores; consecutive ones form one entity run (the
    # behavior a trained char-LSTM exhibits on multi-word names)
    cores: list[tuple[int, int, str, bool]] = []  # (core_start, core_end, core, ends_run)
    for s, e in (S.word_offsets(text) if offs is None else offs):
        wtext = text[s:e]
        if core_cache is None:
            hit = _parse_core(wtext)
        else:
            hit = core_cache.get(wtext, False)
            if hit is False:
                hit = _parse_core(wtext)
                core_cache[wtext] = hit
        if hit is not None:
            lead, core_len, core, ends = hit
            cs = s + lead
            cores.append((cs, cs + core_len, core, ends))
        else:
            cores.append((-1, -1, "", True))
    run: list[tuple[int, int, str]] = []

    def flush(run: list[tuple[int, int, str]]) -> None:
        if not run:
            return
        cls = _word_class_hash(" ".join(c for _, _, c in run))
        lo, hi = run[0][0], run[-1][1]
        bias[lo:hi, 0] = -_BIAS_O
        bias[lo:hi, cls] = _BIAS_ENT

    for cs, ce, core, ends in cores:
        if not core:
            flush(run)
            run = []
            continue
        run.append((cs, ce, core))
        if ends:
            flush(run)
            run = []
    flush(run)
    return bias


# ---------------------------------------------------------------------------
# constrained Viterbi (ref:src/decoder.py:~40-80)
# ---------------------------------------------------------------------------


def viterbi_path(logits: np.ndarray, is_space: np.ndarray,
                 trans: np.ndarray) -> np.ndarray:
    """Max-plus DP over [T, NC] with the word-consistency constraint:
    at position t, class may change only if text[t-1] or text[t] is space."""
    T = logits.shape[0]
    if T == 0:
        return np.zeros(0, dtype=np.int64)
    score = logits[0].astype(np.float32).copy()
    back = np.zeros((T, NC), dtype=np.int8)
    back[0] = np.arange(NC)
    for t in range(1, T):
        if is_space[t] or is_space[t - 1]:
            cand = score[:, None] + trans  # [prev, cur]
            prev = cand.argmax(axis=0)
            score = cand.max(axis=0) + logits[t]
        else:
            prev = np.arange(NC)
            score = score + logits[t]
        back[t] = prev
    path = np.zeros(T, dtype=np.int64)
    path[T - 1] = int(score.argmax())
    for t in range(T - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    return path


def viterbi_batch(logits: np.ndarray, boundary: np.ndarray,
                  trans: np.ndarray) -> np.ndarray:
    """Vectorized max-plus DP over a bucket: logits [n, T, NC] (pad steps
    zeroed), boundary [n, T] (True where a class change is allowed; False at
    pad steps ⇒ identity transition, so per-row paths equal the unpadded
    :func:`viterbi_path` result). Returns paths [n, T]."""
    n, T, C = logits.shape
    if T == 0:
        return np.zeros((n, 0), dtype=np.int64)
    score = logits[:, 0, :].astype(np.float32).copy()
    back = np.empty((n, T, C), dtype=np.int8)
    back[:, 0, :] = np.arange(C, dtype=np.int8)
    idc = np.arange(C, dtype=np.int8)
    for t in range(1, T):
        cand = score[:, :, None] + trans[None, :, :]  # [n, prev, cur]
        prev_full = cand.argmax(axis=1)
        score_full = np.take_along_axis(cand, prev_full[:, None, :], axis=1)[:, 0, :]
        bt = boundary[:, t : t + 1]
        score = np.where(bt, score_full, score) + logits[:, t, :]
        back[:, t, :] = np.where(bt, prev_full.astype(np.int8), idc[None, :])
    paths = np.zeros((n, T), dtype=np.int64)
    paths[:, T - 1] = score.argmax(axis=1)
    rows = np.arange(n)
    for t in range(T - 1, 0, -1):
        paths[:, t - 1] = back[rows, t, paths[:, t]]
    return paths


# ---------------------------------------------------------------------------
# end-to-end per-sentence tagging (fused M1+M2+M4+M5, SURVEY §2.9)
# ---------------------------------------------------------------------------


def _path_spans(text: str, path_list: list[int],
                offs: list[tuple[int, int]]) -> list[tuple[int, int, str]]:
    """Char spans straight from the integer Viterbi path — equivalent to
    ``S.char_spans(text, [CLASSES[k] for k in path_list])`` (equivalence
    property-tested in tests/test_tagger_oracle.py).

    Fast path: the word-consistency constraint (:func:`viterbi_batch`
    boundary mask) makes the class constant inside every word, so the
    per-word majority vote collapses to ``path[word_start]`` and the whole
    extraction runs on small int comparisons instead of per-char string
    dict counting. Any sentence violating constancy (a caller feeding a
    non-Viterbi path) delegates to the generic string implementation, so
    outputs are bitwise-identical by construction either way."""
    word_cls: list[int] = []
    for s, e in offs:
        c0 = path_list[s]
        for i in range(s + 1, e):
            if path_list[i] != c0:
                # not word-constant → exact generic fallback
                return S.char_spans(text, [CLASSES[k] for k in path_list])
        word_cls.append(c0)
    spans: list[tuple[int, int, int]] = []
    cur: tuple[int, int, int] | None = None  # open (begin, end, class)
    for k, (s, e) in enumerate(offs):
        c = word_cls[k]
        if c == 0:  # OUT
            if cur is not None:
                spans.append(cur)
                cur = None
            continue
        joined = False
        if k > 0 and word_cls[k - 1] == c:
            # std scheme: merge only when the inter-word gap carries the
            # class too (space-bridged entity) — mirrors
            # char_classes_to_word_tags + bio_spans exactly
            pe = offs[k - 1][1]
            joined = all(path_list[i] == c for i in range(pe, s))
        if joined and cur is not None:
            cur = (cur[0], e, c)
        else:
            if cur is not None:
                spans.append(cur)
            cur = (s, e, c)
    if cur is not None:
        spans.append(cur)
    return [(b, e, CLASSES[c]) for b, e, c in spans]


def tag_sentences(texts: list[str], lang: str,
                  weights: dict[str, np.ndarray] | None = None
                  ) -> list[list[tuple[int, int, str, float]]]:
    """Batch of sentences (one language) → per-sentence mention spans
    ``(begin, end_exclusive, ner_type, score)`` with char offsets.

    ``weights`` overrides the seeded per-language parameters (the
    reference's load-params-from-storage path, ref:src/exper.py:~300-340;
    see :func:`load_weights`).

    Rows are length-sorted and cut into consecutive BATCH_ROWS-row chunks,
    each padded to its own longest row; the mask and the per-direction
    boundary handling keep padded positions out of every recurrence, so
    per-row results stay bitwise-identical across any batch composition
    (determinism requirement, SURVEY §7 risk (a)). The mask machinery is
    load-bearing — padding DOES exist inside a chunk."""
    w = weights if weights is not None else model_weights(lang)
    results: list[list[tuple[int, int, str, float]]] = [[] for _ in texts]
    # Two exactness-preserving short cuts (both inside this shared function,
    # so the oracle takes them identically):
    #  (a) duplicate sentences (web boilerplate) are tagged once and fanned
    #      out — results depend only on (text, lang);
    #  (b) sentences with no uppercase char are provably all-O: the bias
    #      channel gives O a +2/-(-2)=4 margin per char over entity classes
    #      while the seeded-BiLSTM term is bounded by |Wout|·|h|·scale ≈ 0.13,
    #      and transitions (±0.5) cannot bridge a ≥1.3-per-char deficit, so
    #      Viterbi returns O everywhere → zero mentions, skip the tensors.
    first_idx: dict[str, int] = {}
    dup_of: dict[int, int] = {}
    by_len: dict[int, list[int]] = {}
    import re

    ascii_upper = re.compile(r"[A-Z]").search  # C-speed (b)-check for ASCII
    for i, t in enumerate(texts):
        if not t:
            continue
        j = first_idx.setdefault(t, i)
        if j != i:
            dup_of[i] = j
            continue
        if t.isascii():
            if ascii_upper(t) is None:
                continue  # (b): provably mention-free
        elif not any(c.isupper() for c in t):
            continue  # (b): provably mention-free
        by_len.setdefault(len(t), []).append(i)
    # sorted consecutive chunks, padded to the chunk-local max length
    # (round 6; was: pad to 32-char bucket multiples). Sorting by exact
    # length and cutting every BATCH_ROWS rows keeps chunks FULL while
    # shrinking time padding to the within-chunk length spread — ~25% of
    # all char steps were bucket padding before, ~30% measured win on the
    # bench corpus. Chunk size still bounded by BATCH_ROWS so the
    # recurrent scratch ([chunk, 4H] fp32) stays L2-resident per worker
    # (DRAM-streaming batches stop scaling across many workers —
    # measured: eff(2→8 procs) 0.93 at ~300-row batches vs 0.63 at
    # ~6000-row). Batch composition cannot perturb results (mask
    # carry-through discipline, pinned by tests/test_tagger_kernels.py).
    chunks: list[tuple[int, list[int]]] = []
    order = [i for L in sorted(by_len) for i in by_len[L]]
    for k in range(0, len(order), BATCH_ROWS):
        idxs = order[k : k + BATCH_ROWS]
        chunks.append((len(texts[idxs[-1]]), idxs))
    for bucket, idxs in chunks:
        n = len(idxs)
        ids = np.zeros((n, bucket), dtype=np.int64)
        mask = np.zeros((n, bucket), dtype=bool)
        boundary = np.zeros((n, bucket), dtype=bool)
        # word offsets computed ONCE per sentence here and shared with the
        # bias featurizer and span extraction (was 3 identical scans);
        # space flags come vectorized off the codepoint array via the
        # _SPACE_LUT table (≡ str.isspace, pinned by tests) instead of a
        # per-char Python generator — bitwise-identical results
        offs_rows: list[list[tuple[int, int]]] = []
        core_cache: dict = {}  # per-chunk _parse_core memo (Zipf word forms)
        for row, i in enumerate(idxs):
            text = texts[i]
            L = len(text)
            raw = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            ids[row, :L] = np.minimum(raw, VOCAB - 1)
            mask[row, :L] = True
            sp = _SPACE_LUT[np.minimum(raw, 12289)]
            boundary[row, 1:L] = sp[1:] | sp[:-1]
            offs_rows.append(S.word_offsets(text))
        lg = bilstm_logits(ids, w, mask) * _LOGIT_SCALE
        for row, i in enumerate(idxs):
            L = len(texts[i])
            lg[row, :L] += feature_bias(texts[i], offs=offs_rows[row],
                                        core_cache=core_cache)
        lg *= mask[:, :, None]  # zero pad steps so DP carries scores through
        paths = viterbi_batch(lg, boundary, w["trans"])
        for row, i in enumerate(idxs):
            text = texts[i]
            L = len(text)
            span_list = _path_spans(text, paths[row, :L].tolist(), offs_rows[row])
            mrow: np.ndarray | None = None  # per-char margin, built on demand
            for b, e, cls in span_list:
                # trim edge punctuation ("Alice." → "Alice")
                while b < e and text[b] in "\"'.,;:!?()[]":
                    b += 1
                while e > b and text[e - 1] in "\"'.,;:!?()[]":
                    e -= 1
                if b >= e:
                    continue
                if mrow is None:
                    seg = lg[row, :L]
                    mrow = seg.max(axis=1) - seg[:, 0]
                # exact replica of float(np.mean(mrow[b:e])) without the
                # _mean wrapper (~5.8µs → ~1.8µs per span): same pairwise
                # float32 umr_sum (np.add.reduce IS _mean's umr_sum), same
                # float64 divide, same float32 cast — numpy 1.26 _mean
                # scalar branch `ret.dtype.type(ret / rcount)` verbatim.
                # Pinned bitwise-equal over 300k random slices + the A/B
                # gates (round-6 perf).
                margin = float(np.float32(
                    float(np.add.reduce(mrow[b:e])) / (e - b)))
                results[i].append((b, e, cls, round(margin, 4)))
    for i, j in dup_of.items():
        results[i] = list(results[j])
    return results
