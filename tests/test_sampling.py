"""Dataset-assembly operators (operators/sampling.py): invariants beyond
the q51-q54 DuckDB oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nfl_feature_store_spark.operators.sampling import (
    contamination_report,
    deterministic_sample,
    entity_split,
    pack_sequences,
)


def test_deterministic_sample_is_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        r.doc_id for r in deterministic_sample(docs.repartition(3), "doc_id", 300).collect()
    )
    b = sorted(
        r.doc_id for r in deterministic_sample(docs.repartition(17), "doc_id", 300).collect()
    )
    assert a == b and 0 < len(a) < docs.count()
    # disjoint seeds give (near-)independent membership, same expected rate
    c = {r.doc_id for r in deterministic_sample(docs, "doc_id", 300, seed=99).collect()}
    assert set(a) != c
    assert deterministic_sample(docs, "doc_id", 1000).count() == docs.count()
    with pytest.raises(ValueError, match="permille"):
        deterministic_sample(docs, "doc_id", 0)


def test_entity_split_never_straddles_entities(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = entity_split(ev, "user_id").select("user_id", "split").toPandas()
    per_entity = out.groupby("user_id")["split"].nunique()
    assert (per_entity == 1).all(), "an entity appeared in more than one split"
    shares = out.drop_duplicates("user_id")["split"].value_counts(normalize=True)
    assert shares["train"] > shares.get("val", 0)
    with pytest.raises(ValueError, match="sum to 1000"):
        entity_split(ev, "user_id", weights={"train": 700, "val": 100})


def test_contamination_catches_planted_duplicates(spark):
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    train_rows = [
        (i, " ".join(rng.choice(words, 60))) for i in range(40)
    ]
    # eval: 5 exact copies of train docs, 5 near-copies (2 words changed),
    # 10 fresh random docs
    evals = []
    for j in range(5):
        evals.append((100 + j, train_rows[j][1]))
    for j in range(5):
        toks = train_rows[10 + j][1].split()
        toks[0], toks[-1] = "omega", "psi"
        evals.append((200 + j, " ".join(toks)))
    for j in range(10):
        evals.append((300 + j, " ".join(rng.choice(words, 60))))
    t = spark.createDataFrame(pd.DataFrame(train_rows, columns=["doc_id", "text"]))
    e = spark.createDataFrame(pd.DataFrame(evals, columns=["doc_id", "text"]))
    rep = contamination_report(t, e, "doc_id", "text", min_est_jaccard=0.5).toPandas()
    got = set(rep["eval_id"])
    # every exact copy MUST be flagged at jaccard 1.0
    for j in range(5):
        assert 100 + j in got, f"exact duplicate {100 + j} missed"
    exact = rep[rep.eval_id < 200]
    assert (exact["max_est_jaccard"] == 1.0).all()
    # near-copies should overwhelmingly surface too (2/60 words changed)
    assert sum((200 + j) in got for j in range(5)) >= 4


def test_pack_sequences_offsets_are_consistent(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        F.expr("size(filter(split(lower(coalesce(text, '')), '\\\\s+'), t -> t != ''))")
        .cast("long")
        .alias("n_tokens"),
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", budget=500, n_shards=4).toPandas()
    assert len(out) == docs.count()
    for shard, g in out.sort_values("doc_id").groupby("shard"):
        start = 0
        for _, r in g.iterrows():
            assert r["pack_id"] == start // 500
            assert r["pack_offset"] == start - r["pack_id"] * 500
            start += r["n_tokens"]
        # pack ids are dense and nondecreasing in id order within a shard
        assert (g["pack_id"].diff().dropna() >= 0).all()
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(docs, "doc_id", "n_tokens", budget=0)
