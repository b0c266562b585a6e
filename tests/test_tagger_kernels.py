"""Bitwise parity of the fused bi-directional LSTM kernel against the
single-direction reference implementation.

`_lstm_bidir` exists purely for speed (one batched matmul + one set of
elementwise ops per step instead of two full passes — the step loop is
dispatch-bound at H=16, ~70% of the tag stage when profiled). The engine's
determinism story ("per-row fp32 ops, bitwise-stable across batch
composition and parallelism") only survives if the fused kernel is exactly
the reference computation, so equality here is `==`, not allclose.
"""

import numpy as np

from char_ner_spark import tagger as TG


def _rand_weights(rng, din, H):
    return (
        rng.normal(0, 0.08, (din, 4 * H)).astype(np.float32),
        rng.normal(0, 0.08, (H, 4 * H)).astype(np.float32),
        rng.normal(0, 0.02, 4 * H).astype(np.float32),
    )


def _ref_bidir(x, mask, Wxf, Whf, bf, Wxb, Whb, bb):
    fw = TG._lstm_dir(x, mask, Wxf, Whf, bf, reverse=False)
    bw = TG._lstm_dir(x, mask, Wxb, Whb, bb, reverse=True)
    return np.concatenate([fw, bw], axis=2)


def test_lstm_bidir_bitwise_equals_reference():
    rng = np.random.RandomState(7)
    H = TG.HIDDEN
    for trial, (n, T, din) in enumerate(
        [(1, 1, TG.EMB_DIM), (3, 7, TG.EMB_DIM), (16, 40, 2 * H),
         (192, 25, TG.EMB_DIM), (5, 120, 2 * H)]
    ):
        x = rng.normal(0, 0.3, (n, T, din)).astype(np.float32)
        Wxf, Whf, bf = _rand_weights(rng, din, H)
        Wxb, Whb, bb = _rand_weights(rng, din, H)
        # ragged validity masks (prefix-valid rows, like bucket padding)
        mask = np.zeros((n, T), dtype=bool)
        for r in range(n):
            mask[r, : rng.randint(1, T + 1)] = True
        for m in (mask, np.ones((n, T), dtype=bool)):  # ragged + all-valid
            fused = TG._lstm_bidir(x, m, Wxf, Whf, bf, Wxb, Whb, bb)
            ref = _ref_bidir(x, m, Wxf, Whf, bf, Wxb, Whb, bb)
            assert fused.dtype == np.float32
            assert np.array_equal(fused, ref), (trial, bool(m.all()))


def test_bilstm_logits_bitwise_composition_independent():
    """A row's logits are a pure function of its content — independent of
    which rows it was batched with, its position in the batch, and the
    padded length. This did NOT hold before the output-projection row
    padding in bilstm_logits: BLAS computes the m-tail rows of the narrow
    [m,2H]@[2H,NC] GEMM with a cleanup kernel whose accumulation order
    differs, so logits drifted ~1e-8 with batch shape, and cross-
    parallelism conf equality rested on round(margin, 4) never landing on
    a boundary. Now it is structural."""
    w = TG.model_weights("en")
    texts = ["Alice met Bob.", "x", "The Berlin Wall fell in 1989, Peter."]
    solo = [TG.bilstm_logits(TG.encode_chars(s)[None, :], w) for s in texts]
    T = max(len(s) for s in texts)
    ids = np.zeros((len(texts), T), dtype=np.int64)
    mask = np.zeros((len(texts), T), dtype=bool)
    for r, s in enumerate(texts):
        ids[r, : len(s)] = TG.encode_chars(s)
        mask[r, : len(s)] = True
    lg = TG.bilstm_logits(ids, w, mask)
    for r, s in enumerate(texts):
        assert np.array_equal(lg[r, : len(s)], solo[r][0]), s
    # row order within a batch must not matter either
    rng = np.random.RandomState(3)
    perm = rng.permutation(len(texts))
    lgp = TG.bilstm_logits(ids[perm], w, mask[perm])
    assert np.array_equal(lgp, lg[perm])


def test_tag_sentences_partitioning_invariant():
    """The end-to-end per-sentence contract the scaling story rests on: the
    tagged spans (incl. fp32-derived confidences) for a sentence must not
    change when the corpus is reordered or split across workers — exactly
    what varies between local[8] and local[32] partitionings."""
    rng = np.random.RandomState(11)
    sents = [
        f"{'Alice Berg' if i % 3 else 'Peter Alt'} visited "
        f"{'Berlin' if i % 2 else 'Madrid Rose'} in 199{i % 10}."
        for i in range(137)
    ]
    whole = TG.tag_sentences(sents, "en")
    order = list(rng.permutation(len(sents)))
    shuffled = TG.tag_sentences([sents[i] for i in order], "en")
    assert all(whole[oi] == shuffled[k] for k, oi in enumerate(order))
    split = TG.tag_sentences(sents[:61], "en") + TG.tag_sentences(sents[61:], "en")
    assert split == whole


def test_det_gemm_fallback_invariants(monkeypatch):
    """The k-loop fallback (`_det_gemm`/`_step_matmul` det path) must hold
    the same invariants the fast path is probed for — it is the path every
    host falls back to when its BLAS fails the row-stability probe, so it
    is exercised here explicitly regardless of what this host probed."""
    monkeypatch.setattr(TG, "_FAST_GEMM", False)
    rng = np.random.RandomState(13)
    # fused bidir == single-direction reference, bitwise
    n, T, din = 9, 21, TG.EMB_DIM
    H = TG.HIDDEN
    x = rng.normal(0, 0.3, (n, T, din)).astype(np.float32)
    Wxf, Whf, bf = _rand_weights(rng, din, H)
    Wxb, Whb, bb = _rand_weights(rng, din, H)
    mask = np.zeros((n, T), dtype=bool)
    for r in range(n):
        mask[r, : rng.randint(1, T + 1)] = True
    fused = TG._lstm_bidir(x, mask, Wxf, Whf, bf, Wxb, Whb, bb)
    ref = _ref_bidir(x, mask, Wxf, Whf, bf, Wxb, Whb, bb)
    assert np.array_equal(fused, ref)
    # batch-composition independence of logits
    w = TG.model_weights("en")
    texts = ["Alice met Bob.", "x", "Berlin 1989, Peter."]
    solo = [TG.bilstm_logits(TG.encode_chars(s)[None, :], w) for s in texts]
    Tm = max(len(s) for s in texts)
    ids = np.zeros((len(texts), Tm), dtype=np.int64)
    m2 = np.zeros((len(texts), Tm), dtype=bool)
    for r, s in enumerate(texts):
        ids[r, : len(s)] = TG.encode_chars(s)
        m2[r, : len(s)] = True
    lg = TG.bilstm_logits(ids, w, m2)
    for r, s in enumerate(texts):
        assert np.array_equal(lg[r, : len(s)], solo[r][0]), s


def test_det_gemm_matches_blas_semantics_loosely():
    """det and fast paths are DIFFERENT accumulation orders — never
    bitwise-compared — but they compute the same math (allclose) and the
    det path is shape-stable by construction."""
    rng = np.random.RandomState(5)
    A = rng.normal(0, 0.3, (100, 32)).astype(np.float32)
    W = rng.normal(0, 0.1, (32, 64)).astype(np.float32)
    d = TG._det_gemm(A, W)
    assert np.allclose(d, A @ W, atol=1e-5)
    full = TG._det_gemm(A, W)
    for m in (1, 3, 17, 99):
        assert np.array_equal(TG._det_gemm(A[:m], W), full[:m])


def test_gemm_env_override(monkeypatch):
    """CHAR_NER_GEMM pins the path explicitly (the heterogeneous-cluster
    escape hatch — per-host probing must be overridable fleet-wide)."""
    monkeypatch.setattr(TG, "_FAST_GEMM", None)
    monkeypatch.setenv("CHAR_NER_GEMM", "det")
    assert TG._gemm_fast() is False
    monkeypatch.setattr(TG, "_FAST_GEMM", None)
    monkeypatch.setenv("CHAR_NER_GEMM", "fast")
    assert TG._gemm_fast() is True
    monkeypatch.setattr(TG, "_FAST_GEMM", None)  # leave re-probed state
    monkeypatch.delenv("CHAR_NER_GEMM")
    TG._gemm_fast()


def test_space_lut_matches_str_isspace_exactly():
    """The round-6 vectorized isspace table must agree with Python's
    str.isspace() for EVERY Unicode codepoint (the clamp at 12289 relies on
    no space codepoint existing above 12288), and the per-word core memo
    helper must be a pure refactor of the former inline logic."""
    import numpy as np

    from char_ner_spark.tagger import _SPACE_CP, _SPACE_LUT, _parse_core

    truth = [cp for cp in range(0x110000) if chr(cp).isspace()]
    assert sorted(_SPACE_CP) == truth
    assert max(truth) == 12288 and len(_SPACE_LUT) > 12289
    cps = np.arange(0x110000, dtype=np.int64)
    lut_ans = _SPACE_LUT[np.minimum(cps, 12289)]
    py_ans = np.zeros(0x110000, dtype=bool)
    py_ans[truth] = True
    assert np.array_equal(lut_ans, py_ans)
    # _parse_core: spot behaviors the bias featurizer depends on
    assert _parse_core("Alice") == (0, 5, "Alice", False)
    assert _parse_core('"Corp.,') == (1, 4, "Corp", True)
    assert _parse_core("alice") is None
    assert _parse_core("ALICE") is None
    assert _parse_core("A") is None
    assert _parse_core("Ab1") is None
