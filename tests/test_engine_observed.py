"""Observed finalize: convergence aggregates computed as a side effect
of the truncation action (engine.Observed / observed_count) must match
the legacy two-action path exactly — same metrics, same halt round —
on both the localCheckpoint and the durable-parquet truncation legs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.engine import Observed, SuperstepEngine, observed_count


def _count_to_ten(spark, engine):
    """Toy superstep: state (id, v, changed); v increments until 10."""
    init = spark.range(4).select("id", F.lit(0).alias("v"), F.lit(True).alias("changed"))

    def step(state: DataFrame, round_: int):
        new_state = state.select(
            "id",
            F.least(F.col("v") + 1, F.lit(10)).alias("v"),
            (F.col("v") < 10).alias("changed"),
        )
        return new_state, observed_count("changed", n_edges=0, key="frontier")

    return engine.run(init, step, max_rounds=50)


def test_observed_count_halts_like_legacy(spark):
    res = _count_to_ten(spark, SuperstepEngine(spark))
    assert res.converged
    # v reaches 10 at round 9 (changed becomes all-False at round 10)
    assert res.rounds == 11
    assert [m["frontier"] for m in res.metrics][-1] == 0
    vals = {r["id"]: r["v"] for r in res.state.collect()}
    assert vals == {0: 10, 1: 10, 2: 10, 3: 10}


def test_observed_fires_on_durable_checkpoint_leg(spark, tmp_path):
    eng = SuperstepEngine(spark, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)
    res = _count_to_ten(spark, eng)
    assert res.converged
    # every round produced a metrics dict even when the truncation was
    # a parquet write+reread instead of localCheckpoint
    assert all("frontier" in m for m in res.metrics)
    assert res.state.count() == 4


def test_observed_multi_expr_to_metrics(spark):
    init = spark.range(6).select("id", F.col("id").cast("double").alias("x"))
    seen = []

    def step(state: DataFrame, round_: int):
        new_state = state.select("id", (F.col("x") * 2).alias("x"))

        def to_metrics(agg: dict) -> dict:
            seen.append(agg)
            return {"halt": agg["mx"] >= 100.0, "sum_x": agg["sx"]}

        return new_state, Observed(
            exprs=[F.sum("x").alias("sx"), F.max("x").alias("mx")],
            to_metrics=to_metrics,
        )

    res = SuperstepEngine(spark).run(init, step, max_rounds=20)
    assert res.converged
    # max doubles each round: 5 -> 10 -> ... halts when >= 100 (round 5)
    assert res.rounds == 5
    assert seen[-1]["mx"] == 160.0
    assert res.last["sum_x"] == 15 * 32.0


def test_driver_gc_cadence_preserves_results(spark, monkeypatch):
    """SPARK_GRAFT_DRIVER_GC_EVERY forces a driver-JVM System.gc()
    every k supersteps (deterministic ContextCleaner shuffle
    reclamation on 10^9-edge jobs). It must be a pure side effect:
    same rounds, same metrics, same final state."""
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_GC_EVERY", "1")
    eng = SuperstepEngine(spark)
    assert eng.driver_gc_every == 1
    res = _count_to_ten(spark, eng)
    assert res.converged and res.rounds == 11
    vals = {r["id"]: r["v"] for r in res.state.collect()}
    assert vals == {0: 10, 1: 10, 2: 10, 3: 10}
