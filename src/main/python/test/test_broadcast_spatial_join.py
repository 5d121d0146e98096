# -*- coding: utf-8 -*-
"""End-to-end tests for the PySpark wrapper (py4j -> JVM transformer).

Ports the reference's python e2e surface (reference:
src/main/python/test/test_broadcast_spatial_join.py:52-64 - transform +
pipeline save/load) and its golden-distance scala case (reference:
src/test/scala/me/valik/spark/transformer/BroadcastSpatialJoinTest.scala:99-126),
plus the grid (broadcast="none") mode this library adds.

Run:  sbt package && python3 -m pytest src/main/python/test -q
"""

import builtins

import pytest

from graft.transformer import BroadcastSpatialJoin


def rows(df):
    """Sorted list-of-tuples snapshot - order-free frame comparison."""
    return sorted(tuple(r) for r in df.collect())


def check(transformer, input_df, expected_df):
    actual = transformer.transform(input_df)
    assert actual.schema.names == expected_df.schema.names
    assert rows(actual) == rows(expected_df)


@pytest.fixture(scope="module")
def bag(local_spark):
    # the JVM transformer resolves `dataset` through the session catalog
    builtins.spark = local_spark

    poi = local_spark.createDataFrame(
        [("d1", 1.1, 1.1), ("d2", 2.1, 2.1)], ["poi_id", "plon", "plat"])
    poi.createOrReplaceTempView("poi")

    input_df = local_spark.createDataFrame(
        [("i1", 1.0, 1.0), ("i2", 2.0, 2.0)], ["id", "lon", "lat"])

    expected = local_spark.createDataFrame(
        [("i1", 1.0, 1.0, "d1"), ("i2", 2.0, 2.0, "d2")],
        ["id", "lon", "lat", "poi_id"])

    transformer = BroadcastSpatialJoin(
        dataset="poi", dataColumns="poi_id",
        datasetPoint="plon, plat", inputPoint="lon, lat")

    return dict(transformer=transformer, input=input_df, expected=expected)


class TestBroadcastSpatialJoin(object):

    def test_simple_transform(self, bag):
        check(bag["transformer"], bag["input"], bag["expected"])

    def test_params_round_trip(self, bag):
        t = bag["transformer"]
        assert t.getDataset() == "poi"
        assert t.getPredicate() == "nearest"
        assert t.getBroadcast() == "input"
        assert t.getDataColumns() == "poi_id"

    def test_golden_distances(self, bag, local_spark):
        # reference golden values: 15689 m and 15685 m (Vincenty WGS84)
        t = BroadcastSpatialJoin(
            dataset="poi", dataColumns="poi_id",
            datasetPoint="plon, plat", inputPoint="lon, lat",
            distanceColumnAlias="distance")
        out = t.transform(bag["input"])
        got = {r["id"]: r["distance"] for r in out.collect()}
        assert got == {"i1": 15689, "i2": 15685}

    def test_pipeline_save_load(self, bag, tmp_path):
        from pyspark.ml.pipeline import Pipeline

        pth = str(tmp_path / "spatial-join-pipeline")
        new_p = Pipeline().setStages([bag["transformer"]])
        new_p.write().overwrite().save(pth)
        saved_p = Pipeline.load(pth)

        inp, exp = bag["input"], bag["expected"]
        check(new_p.fit(inp), inp, exp)
        check(saved_p.fit(inp), inp, exp)

    def test_transformer_save_load(self, bag, tmp_path):
        pth = str(tmp_path / "spatial-join-transformer")
        t = bag["transformer"]
        t.write().overwrite().save(pth)
        loaded = BroadcastSpatialJoin.load(pth)
        assert loaded.getDataset() == "poi"
        assert loaded.getDatasetPoint() == "plon, plat"
        check(loaded, bag["input"], bag["expected"])

    def test_grid_mode_matches_broadcast(self, bag, local_spark):
        # broadcast="none" routes to the partitioned grid kernel; results
        # must match the broadcast kernel exactly
        t = BroadcastSpatialJoin(
            dataset="poi", dataColumns="poi_id",
            datasetPoint="plon, plat", inputPoint="lon, lat",
            broadcast="none")
        assert rows(t.transform(bag["input"])) == rows(bag["expected"])

    def test_grid_knn(self, bag, local_spark):
        # gridKnn=2 over the grid strategy: two ranked rows per input
        # point with a trailing knn_rank column (1 = nearest)
        t = BroadcastSpatialJoin(
            dataset="poi", dataColumns="poi_id",
            datasetPoint="plon, plat", inputPoint="lon, lat",
            broadcast="none", predicate="nearest", gridKnn="2")
        got = rows(t.transform(bag["input"]).select("id", "poi_id", "knn_rank"))
        assert got == [("i1", "d1", 1), ("i1", "d2", 2),
                       ("i2", "d1", 2), ("i2", "d2", 1)]

    def test_condition(self, bag, local_spark):
        # reference semantics: `right.` = the broadcast side (the input,
        # under the default broadcast="input"), `left.` = the iterated
        # external side. Veto i1 as a candidate: each poi's nearest
        # SATISFYING input is then i2.
        t = BroadcastSpatialJoin(
            dataset="poi", dataColumns="poi_id",
            datasetPoint="plon, plat", inputPoint="lon, lat",
            condition="right.id != 'i1'")
        got = {r["poi_id"]: r["id"] for r in t.transform(bag["input"]).collect()}
        assert got == {"d1": "i2", "d2": "i2"}

    def test_left_outer(self, bag, local_spark):
        # joinType="left" keeps match-less input rows with null externals;
        # the condition starves i2 of candidates on both strategies
        for mode in ("external", "none"):
            t = BroadcastSpatialJoin(
                dataset="poi", dataColumns="poi_id",
                datasetPoint="plon, plat", inputPoint="lon, lat",
                broadcast=mode, predicate="nearest", joinType="left",
                condition="right.poi_id = 'd1' and left.id = 'i1'")
            got = {r["id"]: r["poi_id"] for r in t.transform(bag["input"]).collect()}
            assert got == {"i1": "d1", "i2": None}

    def test_left_outer_rejects_broadcast_input(self, bag):
        t = BroadcastSpatialJoin(
            dataset="poi", dataColumns="poi_id",
            datasetPoint="plon, plat", inputPoint="lon, lat",
            broadcast="input", joinType="left")
        with pytest.raises(Exception):
            t.transform(bag["input"]).collect()

    def test_semi_anti(self, bag, local_spark):
        # existence filters: input schema only, semi + anti partition it
        for mode in ("external", "none"):
            semi = BroadcastSpatialJoin(
                dataset="poi", datasetPoint="plon, plat",
                inputPoint="lon, lat", broadcast=mode,
                predicate="withindist 50000", joinType="semi",
            ).transform(bag["input"])
            anti = BroadcastSpatialJoin(
                dataset="poi", datasetPoint="plon, plat",
                inputPoint="lon, lat", broadcast=mode,
                predicate="withindist 50000", joinType="anti",
            ).transform(bag["input"])
            assert semi.columns == bag["input"].columns
            got_semi = sorted(r["id"] for r in semi.collect())
            got_anti = sorted(r["id"] for r in anti.collect())
            assert got_semi == ["i1", "i2"] and got_anti == []
