"""Cluster-deploy profile smoke tests (round-5 verdict stretch-#9):
iterative operators must honor a configured RELIABLE checkpoint dir —
iterative.cut_lineage switches from localCheckpoint to df.checkpoint
the moment sparkContext.setCheckpointDir is set, with identical
results. session.get_spark_cluster documents/wires the full profile."""

from __future__ import annotations

from pathlib import Path


def _reset_checkpoint_dir(spark):
    """There is no public unset API; reach the scala var so the shared
    session fixture doesn't leak a (pytest-temporary!) checkpoint dir
    into later tests."""
    jsc = spark.sparkContext._jsc.sc()
    getattr(jsc, "checkpointDir_$eq")(spark._jvm.scala.Option.apply(None))


def test_cut_lineage_uses_reliable_checkpoint_when_dir_set(spark, tmp_path):
    from django_indexer_spark.iterative import cut_lineage, has_checkpoint_dir

    df = spark.range(10)
    assert not has_checkpoint_dir(df)
    local = cut_lineage(df)  # local branch — no dir configured
    assert local.count() == 10

    ckdir = tmp_path / "ck"
    spark.sparkContext.setCheckpointDir(str(ckdir))
    try:
        assert has_checkpoint_dir(df)
        reliable = cut_lineage(spark.range(7))
        assert reliable.count() == 7
        assert any(p.is_file() for p in ckdir.rglob("*")), (
            "no reliable checkpoint files written under the configured dir"
        )
    finally:
        _reset_checkpoint_dir(spark)
    assert not has_checkpoint_dir(df)


def test_graph_loops_honor_checkpoint_dir(spark, tmp_path):
    """connected_components through the RELIABLE checkpoint path: same
    answer, per-round state files under the configured dir."""
    from django_indexer_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    plain = {
        (r["id"], r["component"])
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert plain == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    ckdir = tmp_path / "gck"
    spark.sparkContext.setCheckpointDir(str(ckdir))
    try:
        with_dir = {
            (r["id"], r["component"])
            for r in connected_components(edges, "src", "dst").collect()
        }
        assert with_dir == plain
        assert any(p.is_file() for p in Path(ckdir).rglob("*"))
    finally:
        _reset_checkpoint_dir(spark)


def test_get_spark_cluster_profile_shape():
    """The profile must carry the cluster-only settings and not force a
    master (composes with spark-submit). Conf inspection only — the
    test process already holds a local session, so we do not build a
    second one."""
    import inspect

    from django_indexer_spark.session import get_spark_cluster

    src = inspect.getsource(get_spark_cluster)
    for key in (
        "spark.dynamicAllocation.enabled",
        "spark.dynamicAllocation.shuffleTracking.enabled",
        "spark.sql.adaptive.enabled",
        "setCheckpointDir",
    ):
        assert key in src
    assert ".master(" not in src
