"""Training surface (SURVEY §2 A3/O2/M3): gradient correctness (numerical
check), bitwise partition-independence of the distributed gradient, the
deterministic epoch shuffle, learning progress, and the round-trip into
the inference engine's weights surface."""

import numpy as np
import pandas as pd
import pytest

from char_ner_spark import training as T
from char_ner_spark.tagger import CLASSES, tag_sentences


def _toy_corpus(n=24, seed=7):
    """Deterministic labeled sentences: capitalized names tagged PER/LOC."""
    rng = np.random.RandomState(seed)
    firsts = ["Alice", "Bob", "Carol", "Dave"]
    cities = ["Paris", "Berlin", "Madrid"]
    verbs = ["met", "saw", "called"]
    rows = []
    cls_id = {c: i for i, c in enumerate(CLASSES)}
    for i in range(n):
        a = firsts[rng.randint(len(firsts))]
        b = cities[rng.randint(len(cities))]
        v = verbs[rng.randint(len(verbs))]
        text = f"{a} {v} me in {b} today"
        labels = [0] * len(text)
        labels[0 : len(a)] = [cls_id["PER"]] * len(a)
        s = text.index(b)
        labels[s : s + len(b)] = [cls_id["LOC"]] * len(b)
        rows.append((f"s{i}", text, labels))
    return rows


def test_gradient_matches_numerical():
    """Analytic BPTT gradient ≡ central differences on every parameter
    tensor (sampled entries). Tiny-magnitude entries are compared
    absolutely — float64 finite differences of a ~10-magnitude loss bottom
    out near 1e-9."""
    w = T.init_weights("en")
    rng = np.random.RandomState(0)
    text = "Alice Smith met Bob in Paris."
    ids = T._encode(text)
    labels = rng.randint(0, 5, len(text))
    _, g = T.sentence_grad(ids, labels, w)
    eps = 1e-5
    for k in T.PARAM_KEYS:
        flat = w[k].ravel()
        idxs = list(rng.choice(flat.size, size=min(5, flat.size), replace=False))
        if k == "emb":  # also check a used row and an unused row explicitly
            idxs += [int(ids[0]) * w[k].shape[1], (511 * w[k].shape[1])]
        for ix in idxs:
            old = flat[ix]
            flat[ix] = old + eps
            lp = T.ce_loss(T.forward_sentence(ids, w)[0], labels)[0]
            flat[ix] = old - eps
            lm = T.ce_loss(T.forward_sentence(ids, w)[0], labels)[0]
            flat[ix] = old
            num = (lp - lm) / (2 * eps)
            ana = g[k].ravel()[ix]
            assert (
                abs(num - ana) < 1e-7
                or abs(num - ana) / (abs(num) + abs(ana)) < 1e-4
            ), (k, ix, num, ana)


def test_unused_vocab_rows_get_zero_grad():
    w = T.init_weights("en")
    text = "abc Abc"
    ids = T._encode(text)
    labels = np.zeros(len(text), dtype=np.int64)
    _, g = T.sentence_grad(ids, labels, w)
    used = set(ids.tolist())
    unused = [r for r in range(w["emb"].shape[0]) if r not in used]
    assert np.all(g["emb"][unused] == 0.0)
    assert np.any(g["emb"][sorted(used)] != 0.0)


def test_flatten_unflatten_roundtrip():
    w = T.init_weights("en")
    g = {k: np.random.RandomState(1).normal(size=w[k].shape) for k in T.PARAM_KEYS}
    v = T.flatten_grads(g)
    back = T.unflatten(v, w)
    for k in T.PARAM_KEYS:
        assert np.array_equal(back[k], g[k])


@pytest.fixture(scope="module")
def train_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(_toy_corpus(), columns=["sent_id", "text", "labels"])
    )


def test_loss_decreases_and_best_epoch(spark, train_df):
    res = T.train(spark, train_df, epochs=3, lr=2.0, n_batches=2, seed=42)
    costs = [c for _, c in res["costs"]]
    assert len(costs) == 3
    assert costs[-1] < costs[0], costs
    assert res["best_epoch"] == int(np.argmin(costs))
    tab = T.costs_table(spark, res["costs"])
    assert tab.count() == 3
    assert set(tab.columns) == {"epoch", "mean_cost"}


def test_training_bitwise_partition_independent(spark, train_df):
    """The whole trajectory (final weights, every epoch cost) must be
    bitwise identical whether the corpus lives in 1 partition or 7 —
    int64 fixed-point gradient aggregation is associative, so HOW Spark
    splits the batch cannot perturb a single bit."""
    r1 = T.train(spark, train_df.repartition(1), epochs=2, lr=1.0,
                 n_batches=2, seed=42)
    r7 = T.train(spark, train_df.repartition(7), epochs=2, lr=1.0,
                 n_batches=2, seed=42)
    assert r1["costs"] == r7["costs"]
    for k in sorted(r1["weights"]):
        assert np.array_equal(r1["weights"][k], r7["weights"][k]), k


def test_epoch_shuffle_redeals_and_is_deterministic(spark, train_df):
    """O2: the batch dealing changes between epochs (it IS a shuffle) and
    is reproducible for a given (epoch, seed) — no driver RNG state."""
    e0 = {r["sent_id"]: r["batch"]
          for r in T.with_batch_col(train_df, 0, 4).collect()}
    e0b = {r["sent_id"]: r["batch"]
           for r in T.with_batch_col(train_df, 0, 4).collect()}
    e1 = {r["sent_id"]: r["batch"]
          for r in T.with_batch_col(train_df, 1, 4).collect()}
    assert e0 == e0b
    assert e0 != e1
    assert set(e0.values()) <= set(range(4))


def test_trained_weights_drive_inference_and_improve_fit(spark, train_df):
    """M3 end-to-end: training reduces per-char error on the training set,
    and the finalized weights flow through the existing inference surface
    (tag_sentences weights=..., the S3 npz layout)."""
    rows = _toy_corpus()

    def char_err(weights):
        logits_err = 0
        total = 0
        w64 = {k: v.astype(np.float64) for k, v in weights.items()}
        for _, text, labels in rows:
            logits, _ = T.forward_sentence(T._encode(text), w64)
            pred = logits.argmax(axis=1)
            logits_err += int((pred != np.asarray(labels)).sum())
            total += len(text)
        return logits_err / total

    init = T.finalize_weights(T.init_weights("en"))
    res = T.train(spark, train_df, epochs=4, lr=2.0, n_batches=2, seed=42)
    assert char_err(res["weights"]) < char_err(init)
    # the fp32 dict is the same surface save_weights/tag_sentences use
    out = tag_sentences(["Alice met me in Paris today"], "en",
                        weights=res["weights"])
    assert isinstance(out[0], list)


def test_checkpoint_resume_bitwise_equals_straight_run(spark, train_df, tmp_path):
    """Kill-and-resume ≡ uninterrupted: the epoch schedule is state-free
    and the gradient sums are exact int64, so resuming from the epoch-1
    checkpoint reproduces epochs 2.. bit-for-bit."""
    straight = T.train(spark, train_df, epochs=3, lr=1.0, n_batches=2, seed=42)
    ckpt = str(tmp_path / "ckpt")
    partial = T.train(spark, train_df, epochs=2, lr=1.0, n_batches=2,
                      seed=42, checkpoint_dir=ckpt)
    assert len(partial["costs"]) == 2
    resumed = T.train(spark, train_df, epochs=3, lr=1.0, n_batches=2,
                      seed=42, checkpoint_dir=ckpt)
    assert [e for e, _ in resumed["costs"]] == [0, 1, 2]
    assert resumed["costs"] == straight["costs"]
    for k in sorted(straight["weights"]):
        assert np.array_equal(resumed["weights"][k], straight["weights"][k]), k
    # a fully-complete checkpoint resumes to a no-op with identical output
    again = T.train(spark, train_df, epochs=3, lr=1.0, n_batches=2,
                    seed=42, checkpoint_dir=ckpt)
    assert again["costs"] == straight["costs"]


def test_stability_knobs_momentum_clip_dev(spark, train_df, tmp_path):
    """Reference training-stability knobs (lasagne.updates momentum,
    --gclip, dev-set model selection): each must change/govern the
    trajectory as specified while keeping it deterministic."""
    base = T.train(spark, train_df, epochs=2, lr=1.0, n_batches=2, seed=42)
    mom = T.train(spark, train_df, epochs=2, lr=1.0, n_batches=2, seed=42,
                  momentum=0.9)
    assert not np.array_equal(base["weights"]["Wout"], mom["weights"]["Wout"])
    # a binding clip changes the trajectory; a huge clip is a no-op
    clipped = T.train(spark, train_df, epochs=2, lr=1.0, n_batches=2,
                      seed=42, clip_norm=1e-3)
    unclipped = T.train(spark, train_df, epochs=2, lr=1.0, n_batches=2,
                        seed=42, clip_norm=1e9)
    assert not np.array_equal(base["weights"]["Wout"], clipped["weights"]["Wout"])
    for k in sorted(base["weights"]):
        assert np.array_equal(base["weights"][k], unclipped["weights"][k]), k
    # dev ledger governs best_epoch and the returned weights
    res = T.train(spark, train_df, epochs=3, lr=2.0, n_batches=2, seed=42,
                  dev=train_df)
    assert len(res["dev_costs"]) == 3
    assert res["best_epoch"] == int(np.argmin([c for _, c in res["dev_costs"]]))


def test_patience_stops_early(spark, train_df):
    """A divergent lr makes dev cost blow up after epoch 0 — patience=1
    must stop the run early and return the epoch-0 (best-dev) weights."""
    res = T.train(spark, train_df, epochs=8, lr=200.0, n_batches=2, seed=42,
                  dev=train_df, patience=1)
    assert len(res["costs"]) < 8, "patience did not stop a divergent run"
    assert res["best_epoch"] == int(np.argmin([c for _, c in res["dev_costs"]]))


def test_resume_rejects_changed_hyperparameters(spark, train_df, tmp_path):
    """Resuming a checkpoint under different trajectory-defining
    hyperparameters must fail loud, not silently train a hybrid run.
    Extending epochs is allowed (that's what resume is for)."""
    ckpt = str(tmp_path / "ckpt_hp")
    T.train(spark, train_df, epochs=1, lr=1.0, n_batches=2, seed=42,
            checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="hyperparameters"):
        T.train(spark, train_df, epochs=2, lr=0.5, n_batches=2, seed=42,
                checkpoint_dir=ckpt)
    with pytest.raises(ValueError, match="hyperparameters"):
        T.train(spark, train_df, epochs=2, lr=1.0, n_batches=3, seed=42,
                checkpoint_dir=ckpt)
    res = T.train(spark, train_df, epochs=2, lr=1.0, n_batches=2, seed=42,
                  checkpoint_dir=ckpt)  # extend: fine
    assert [e for e, _ in res["costs"]] == [0, 1]


def test_momentum_resume_bitwise(spark, train_df, tmp_path):
    """Velocity is part of the checkpoint: a momentum run resumed from the
    epoch-1 checkpoint must reproduce the straight run bit-for-bit."""
    kw = dict(epochs=3, lr=1.0, n_batches=2, seed=42, momentum=0.9)
    straight = T.train(spark, train_df, **kw)
    ckpt = str(tmp_path / "ckpt_m")
    T.train(spark, train_df, epochs=2, lr=1.0, n_batches=2, seed=42,
            momentum=0.9, checkpoint_dir=ckpt)
    resumed = T.train(spark, train_df, checkpoint_dir=ckpt, **kw)
    assert resumed["costs"] == straight["costs"]
    for k in sorted(straight["weights"]):
        assert np.array_equal(resumed["weights"][k], straight["weights"][k]), k


def test_conll_to_train_df(spark, tmp_path):
    from char_ner_spark.sources import read_conll, write_conll_fixture

    path = str(tmp_path / "train.conll")
    write_conll_fixture(path, n_sents=12, seed=3)
    sents = T.conll_to_train_df(read_conll(spark, path))
    pdf = sents.toPandas()
    assert len(pdf) == 12
    for _, r in pdf.iterrows():
        assert len(r["labels"]) == len(r["text"])
        assert set(int(x) for x in r["labels"]) <= set(range(len(CLASSES)))
