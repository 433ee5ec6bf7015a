"""Age-depth calibration units (Exposure.fs:87-105) and edge-date
promotion queries (see also tests/test_graph.py::TestEdgePayloads)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from biodiversity_graph_db_spark.operators import temporal


class TestAgeDepth:
    def _models(self, spark):
        # one model: (0cm, 100BP) (10cm, 200BP) (30cm, 1000BP)
        return spark.createDataFrame(
            [("c1", 0.0, 100.0), ("c1", 10.0, 200.0), ("c1", 30.0, 1000.0)],
            "cal_id string, depth double, ctrl_age double",
        )

    def _ages(self, spark, sample_depths):
        samples = spark.createDataFrame(
            [(f"c1", i, d) for i, d in enumerate(sample_depths)],
            "cal_id string, sample_id long, depth double",
        )
        rows = temporal.age_depth_interpolate(
            self._models(spark), samples
        ).collect()
        return {r.sample_id: r.age_bp for r in rows}

    def test_linear_interpolation(self, spark):
        ages = self._ages(spark, [5.0, 20.0])
        assert ages[0] == 150.0          # midway 0-10cm
        assert ages[1] == 600.0          # midway 10-30cm

    def test_exact_control_points(self, spark):
        ages = self._ages(spark, [0.0, 10.0, 30.0])
        assert ages[0] == 100.0
        assert ages[1] == 200.0
        assert ages[2] == 1000.0         # deepest point: forward window empty

    def test_outside_model_is_null(self, spark):
        ages = self._ages(spark, [-1.0, 31.0])
        assert ages[0] is None and ages[1] is None

    def test_parse_age_depth_payload(self, spark):
        payload = json.dumps(
            {
                "CalibrationCurve": "IntCal20",
                "SoftwareName": "OxCal",
                "SoftwareVersion": "4.4",
                "AgeDepthModel": [
                    {"Depth": 0.0, "Date": 100.0, "SD": 10.0},
                    {"Depth": 10.0, "Date": 200.0, "SD": None},
                ],
            }
        )
        nodes = spark.createDataFrame(
            [("datecalibrationinstancenode_x", payload)],
            "key string, payload string",
        )
        pts = temporal.parse_age_depth_payload(nodes).orderBy("depth").collect()
        assert [(p.depth, p.ctrl_age, p.sd) for p in pts] == [
            (0.0, 100.0, 10.0),
            (10.0, 200.0, None),
        ]
