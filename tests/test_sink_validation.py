"""S2 ordered sink + V1 cross-implementation validation."""

import numpy as np
import pandas as pd

from cuda_gis_smoothing_spark import datagen
from cuda_gis_smoothing_spark.operators.smoothing import smooth
from cuda_gis_smoothing_spark.plans.config import SmoothingPlan
from cuda_gis_smoothing_spark.sources.sink import cross_validate, write_ordered


def test_ordered_sink_restores_cell_order(spark, tmp_path):
    pdf = datagen.gen_cells(side=12, n_isolated=1)
    df = spark.createDataFrame(pdf).repartition(5)  # scramble
    out = smooth(df, SmoothingPlan(variant="simple_k1", variables=("ndvi",)))
    p = str(tmp_path / "golden")
    write_ordered(out, p, single_file=True, fmt="csv")
    import glob

    csv = glob.glob(p + "/part-*.csv")[0]
    got = pd.read_csv(csv)
    assert (got["cell"].to_numpy() == np.sort(got["cell"].to_numpy())).all()
    assert len(got) == len(pdf)


def test_cross_validate_accepts_equivalent_impls(spark):
    """Broadcast-forced vs auto join strategy must agree within the
    reference tolerance — two 'physical variants' of one logical op,
    exactly the reference's v1-vs-v4 check."""
    pdf = datagen.gen_cells(side=16, n_isolated=1)
    df = spark.createDataFrame(pdf)
    a = smooth(df, SmoothingPlan(variant="gaussian_k2", variables=("ndvi",)))
    b = smooth(
        df,
        SmoothingPlan(
            variant="gaussian_k2", variables=("ndvi",), broadcast_values=True
        ),
    )
    res = cross_validate(a, b, atol=1e-4)
    assert res["passed"], res
    assert res["max_abs_diff"] < 1e-9


def test_cross_validate_rejects_different_variants(spark):
    pdf = datagen.gen_cells(side=12, n_isolated=0)
    df = spark.createDataFrame(pdf)
    a = smooth(df, SmoothingPlan(variant="simple_k1", variables=("ndvi",)))
    b = smooth(df, SmoothingPlan(variant="gaussian_k1", variables=("ndvi",)))
    res = cross_validate(a, b, atol=1e-4)
    assert not res["passed"]
