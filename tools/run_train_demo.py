"""Drive the training surface end-to-end (SURVEY §2 A3/O2/M3):

CoNLL fixture → conll_to_train_df → mini-batch SGD (exact int64 gradient
aggregation) → cost curve + per-char train error before/after + a
kill-and-resume bitwise check. Prints one summary JSON line.

    python tools/run_train_demo.py [n_sents] [epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_sents = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from char_ner_spark import training as T
    from char_ner_spark.session import build_session
    from char_ner_spark.sources import read_conll, write_conll_fixture

    spark = build_session("train-demo", master="local[8]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="charner_train_demo_")
    try:
        conll = os.path.join(work, "train.conll")
        write_conll_fixture(conll, n_sents=n_sents, seed=11)
        from pyspark.sql import functions as F

        # sent_id embeds the source path; strip the (random) tmpdir so the
        # epoch-hash schedule — hence the printed costs — is identical on
        # every demo invocation
        sents = T.conll_to_train_df(read_conll(spark, conll)).withColumn(
            "sent_id", F.regexp_replace("sent_id", r"^.*/", "")
        )
        rows = sents.collect()

        def char_err(w32) -> float:
            w = {k: v.astype(np.float64) for k, v in w32.items()}
            bad = tot = 0
            for r in rows:
                logits, _ = T.forward_sentence(T._encode(r["text"]), w)
                bad += int((logits.argmax(axis=1) != np.asarray(r["labels"])).sum())
                tot += len(r["text"])
            return bad / max(tot, 1)

        err0 = char_err(T.finalize_weights(T.init_weights("en")))
        ckpt = os.path.join(work, "ckpt")
        res = T.train(spark, sents, epochs=epochs, lr=2.0, n_batches=4,
                      seed=42, checkpoint_dir=ckpt)
        err1 = char_err(res["weights"])
        # resume check: rerun with the same checkpoint dir — must be a
        # no-op returning the identical trajectory
        res2 = T.train(spark, sents, epochs=epochs, lr=2.0, n_batches=4,
                       seed=42, checkpoint_dir=ckpt)
        resume_ok = res2["costs"] == res["costs"] and all(
            np.array_equal(res2["weights"][k], res["weights"][k])
            for k in res["weights"]
        )
        print(json.dumps({
            "n_sents": n_sents,
            "epochs": epochs,
            "costs": [round(c, 6) for _, c in res["costs"]],
            "best_epoch": res["best_epoch"],
            "char_err_init": round(err0, 4),
            "char_err_trained": round(err1, 4),
            "improved": err1 < err0,
            "resume_bitwise_ok": resume_ok,
        }))
        assert err1 < err0, "training did not improve train-set fit"
        assert resume_ok, "checkpoint resume diverged"
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
