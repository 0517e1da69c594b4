"""Non-degeneracy guards for the long-tail vocabulary fixture (r8
verdict ask #5): corpus_heaps_curve and corpus_ngram_novelty were
correct but degenerate on the raw synthetic corpus (31-token shared
vocab — curve saturated at decile 1, novelty collapsed to 0).  The
_longtail_docs suffix ladder must keep both gauges demonstrably
non-trivial, at every SF, or the queries stop measuring anything."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_heaps_curve_grows_through_every_decile(spark):
    from ingest_pipeline_spark import queries as q

    rows = (
        q.queries()["corpus_heaps_curve"](spark, SF_DIR)
        .orderBy("decile")
        .collect()
    )
    assert len(rows) == 10
    vocab = [r.vocab_cum for r in rows]
    # strictly increasing — every ingestion checkpoint buys NEW vocab
    assert all(b > a for a, b in zip(vocab, vocab[1:])), vocab
    assert len(set(vocab)) >= 5  # the verdict's done-criterion


def test_novelty_stays_live_in_late_documents(spark):
    from pyspark.sql import functions as F

    from ingest_pipeline_spark import queries as q

    d = q.queries()["corpus_ngram_novelty"](spark, SF_DIR)
    top = d.orderBy(F.desc("doc_id")).limit(10).collect()
    # the LAST ten documents of the corpus must still contribute novel
    # grams (the zzt tail mints a new symbol every 3 docs)
    assert sum(r.n_novel for r in top) > 0, top
