"""Differential tests: Spark smoothing pipeline vs the pure-Python oracle
on the synthetic fixture grid — the reference's own validation strategy
(golden cross-implementation compare, scripts/case-study.sh:107-137),
at its tolerance (allclose atol=1e-4; we see ~1e-12 since both sides
accumulate in float64)."""

import numpy as np
import pytest

from cuda_gis_smoothing_spark import datagen, oracle
from cuda_gis_smoothing_spark.operators import stats as stats_ops
from cuda_gis_smoothing_spark.operators.smoothing import (
    kring_edges,
    second_order_edges,
    smooth,
    smooth_with_stats,
)
from cuda_gis_smoothing_spark.plans.config import ALL_VARIABLES, SmoothingPlan


@pytest.fixture(scope="module")
def cells_pdf():
    return datagen.gen_cells(side=24, n_isolated=2)


@pytest.fixture(scope="module")
def cells_df(spark, cells_pdf):
    return spark.createDataFrame(cells_pdf).cache()


def _oracle_vals(cells_pdf, variables=("ndvi",)):
    return {
        int(r.cell): {v: float(getattr(r, v)) for v in variables}
        for r in cells_pdf.itertuples()
    }


@pytest.mark.parametrize("variant", sorted(oracle.VARIANTS))
def test_smooth_matches_oracle(spark, cells_df, cells_pdf, variant):
    out = (
        smooth(cells_df, SmoothingPlan(variant=variant, variables=("ndvi",)))
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    exp = oracle.smooth_cells(_oracle_vals(cells_pdf), variant)
    assert len(out) == len(exp)
    exp_arr = np.array([exp[c]["ndvi"] for c in out.index])
    assert np.allclose(out["smoothed_ndvi"].to_numpy(), exp_arr, atol=1e-4)
    # both sides are float64: should in fact be far tighter
    assert np.abs(out["smoothed_ndvi"].to_numpy() - exp_arr).max() < 1e-9


def test_fused_equals_per_variable_runs(spark, cells_df, cells_pdf):
    """Kernel-fusion invariant (reference v4): the 4-variable single-pass
    result must equal four independent single-variable passes."""
    fused = (
        smooth(cells_df, SmoothingPlan(variant="gaussian_k2", variables=ALL_VARIABLES))
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    for v in ALL_VARIABLES:
        single = (
            smooth(
                cells_df.select("cell", v),
                SmoothingPlan(variant="gaussian_k2", variables=(v,)),
            )
            .toPandas()
            .set_index("cell")
            .sort_index()
        )
        assert np.allclose(
            fused[f"smoothed_{v}"].to_numpy(),
            single[f"smoothed_{v}"].to_numpy(),
            atol=1e-12,
        )


def test_isolated_cells_keep_value_spark(spark, cells_df, cells_pdf):
    iso = cells_pdf.nlargest(2, "cell")  # isolated cells have max packed ids
    out = smooth(cells_df, SmoothingPlan(variant="gaussian_k2", variables=("ndvi",)))
    got = {
        r["cell"]: r["smoothed_ndvi"]
        for r in out.where(out.cell.isin([int(c) for c in iso.cell])).collect()
    }
    for r in iso.itertuples():
        assert abs(got[int(r.cell)] - float(r.ndvi)) < 1e-12


def test_second_order_relational_derivation(spark, cells_df):
    """J2: the adjacency two-hop derivation (reference semantics) is a
    subset of the geometric kring ring-2, and equals it on hole-free
    interiors; on this ragged fixture only border/hole cells differ."""
    via_join = second_order_edges(cells_df.select("cell"))
    via_kring = (
        kring_edges(cells_df.select("cell"), 2, include_center=False)
        .where("ring = 2")
        .join(cells_df.select("cell").withColumnRenamed("cell", "nbr"), "nbr", "left_semi")
        .select("cell", "nbr")
    )
    assert via_join.exceptAll(via_kring).count() == 0  # strict ⊆ geometric
    extra = via_kring.exceptAll(via_join).count()
    assert extra >= 0  # ragged fixture: geometric may exceed strict


def test_second_order_equality_on_complete_grid(spark):
    """On a hole-free patch the geometric and adjacency ring-2 sets are
    identical — the reference's own regime (its grid is contiguous)."""
    import numpy as np
    import pandas as pd

    from cuda_gis_smoothing_spark.hexgrid import pack

    qs, rs = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    pdf = pd.DataFrame({"cell": pack(qs.ravel(), rs.ravel())})
    df = spark.createDataFrame(pdf)
    via_join = second_order_edges(df.select("cell"))
    via_kring = (
        kring_edges(df.select("cell"), 2, include_center=False)
        .where("ring = 2")
        .join(df.select("cell").withColumnRenamed("cell", "nbr"), "nbr", "left_semi")
        .select("cell", "nbr")
    )
    assert via_join.exceptAll(via_kring).count() == 0
    assert via_kring.exceptAll(via_join).count() == 0


def test_strict_second_order_smoothing_matches_oracle(spark, cells_df, cells_pdf):
    """Strict (adjacency) two-ring smoothing vs the strict oracle on the
    ragged fixture — the reference's literal semantics."""
    out = (
        smooth(
            cells_df,
            SmoothingPlan(
                variant="gaussian_k2", variables=("ndvi",), strict_second_order=True
            ),
        )
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    exp = oracle.smooth_cells(
        _oracle_vals(cells_pdf), "gaussian_k2", strict_second_order=True
    )
    exp_arr = np.array([exp[c]["ndvi"] for c in out.index])
    assert np.abs(out["smoothed_ndvi"].to_numpy() - exp_arr).max() < 1e-9


def test_neighbor_stats_match_oracle(spark, cells_df, cells_pdf):
    st = stats_ops.neighbor_stats(cells_df).collect()[0].asDict()
    exp = oracle.neighbor_stats([int(c) for c in cells_pdf.cell])
    assert st["min_neighbors"] == exp["min_neighbors"] == 0
    assert st["max_neighbors"] == exp["max_neighbors"] == 6
    assert abs(st["avg_neighbors"] - exp["avg_neighbors"]) < 1e-6
    assert st["total_edges"] == exp["total_edges"]


def test_smooth_with_stats_neighbor_counts(spark, cells_df, cells_pdf):
    out = smooth_with_stats(
        cells_df, SmoothingPlan(variant="simple_k1", variables=("ndvi",))
    )
    exp = oracle.neighbor_stats([int(c) for c in cells_pdf.cell])
    got_total = out.agg({"n_valid_neighbors": "sum"}).collect()[0][0]
    assert got_total == exp["total_edges"]


@pytest.mark.parametrize("variant", sorted(oracle.VARIANTS))
def test_scatter_strategy_equals_gather(spark, cells_df, variant):
    """Two physical strategies, one logical operator — must agree
    (reference cross-validation spirit, v1 vs v2 kernels)."""
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_scatter

    plan = SmoothingPlan(variant=variant, variables=("ndvi", "evi"))
    a = smooth(cells_df, plan).toPandas().set_index("cell").sort_index()
    b = smooth_scatter(cells_df, plan).toPandas().set_index("cell").sort_index()
    assert (a.index == b.index).all()
    for v in ("ndvi", "evi"):
        assert np.allclose(a[f"smoothed_{v}"], b[f"smoothed_{v}"], atol=1e-12)


def test_dangling_neighbors_do_not_contribute(spark):
    """A cell next to the patch border: its missing neighbors add neither
    value nor weight (reference validity-filter semantics,
    src/cuda/hex_smooth_cuda_v1.cu:52)."""
    import pandas as pd

    from cuda_gis_smoothing_spark.hexgrid import neighbor_delta, pack

    c = int(pack(0, 0))
    n1 = c + neighbor_delta(1, 0)
    pdf = pd.DataFrame({"cell": [c, n1], "ndvi": [1.0, 5.0]})
    df = spark.createDataFrame(pdf)
    out = smooth(df, SmoothingPlan(variant="simple_k1", variables=("ndvi",)))
    got = {r["cell"]: r["smoothed_ndvi"] for r in out.collect()}
    assert abs(got[c] - 3.0) < 1e-12
    assert abs(got[n1] - 3.0) < 1e-12


def test_smooth_residual_complements_smooth(spark):
    """residual = original − smoothed (both round6'd separately, so the
    identity holds within the two rounding errors) and the residual
    mass is centered: a low-pass + its detail layer reconstruct the
    signal."""
    from pyspark.sql import functions as F

    from cuda_gis_smoothing_spark.operators.smoothing import (
        smooth,
        smooth_residual,
    )
    from cuda_gis_smoothing_spark.plans.config import SmoothingPlan
    from cuda_gis_smoothing_spark.sources.tables import grid_from_lineitem

    cells = grid_from_lineitem(spark, "/root/testdata/sf0.001")
    plan = SmoothingPlan(variant="gaussian_k2", variables=("ndvi",))
    sm = {r.cell: r.smoothed_ndvi for r in smooth(cells, plan).collect()}
    orig = {r.cell: r.ndvi for r in cells.select("cell", "ndvi").collect()}
    res = {
        r.cell: r.residual_ndvi
        for r in smooth_residual(cells, plan).collect()
    }
    assert set(res) == set(orig)
    for cell, r in res.items():
        assert abs(r - (orig[cell] - sm[cell])) < 2e-6, cell


@pytest.mark.parametrize(
    "plan",
    [
        SmoothingPlan(variant="gaussian_k1", variables=("ndvi",)),
        SmoothingPlan(variant="gaussian_k2", variables=("ndvi", "evi")),
        SmoothingPlan(
            variant="gaussian_k2", variables=("ndvi",), strict_second_order=True
        ),
        SmoothingPlan(variant="uniform_k2", variables=("ndvi",), strategy="scatter"),
    ],
    ids=["gather_k1", "gather_k2_fused", "strict_k2", "scatter_k2"],
)
def test_restrict_to_is_exact_output_subset(spark, cells_df, plan):
    """The incremental-maintenance hook: smooth(..., restrict_to=S)
    must produce EXACTLY the unrestricted rows whose cell is in S, on
    every physical path (geometric gather generates edges from S
    alone; strict/scatter semi-join) — including a dangling key in S
    that is not a live cell (no fabricated row)."""
    import pandas as pd

    sample = [int(r.cell) for r in cells_df.select("cell").limit(7).collect()]
    dangling = max(
        int(r.cell) for r in cells_df.select("cell").collect()
    ) + 10_000_000
    sub = spark.createDataFrame(
        [(c,) for c in [*sample, dangling]], "cell long"
    )
    got = (
        smooth(cells_df, plan, restrict_to=sub)
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    full = smooth(cells_df, plan).toPandas().set_index("cell").sort_index()
    want = full.loc[sorted(sample)]
    assert list(got.index) == list(want.index)  # dangling key absent
    pd.testing.assert_frame_equal(
        got, want, check_exact=False, atol=1e-9, rtol=0
    )


def test_bilateral_limits(spark, cells_df, cells_pdf):
    """Range-kernel limits: sigma_r -> inf reduces the bilateral pass
    to the plain spatial pass (the range kernel goes to 1 everywhere);
    sigma_r -> 0 keeps each cell's ORIGINAL value (only the ring-0
    self term survives — and any neighbor that does survive has a
    value gap bounded by ~sigma, so the residual shift is below the
    reference tolerance)."""
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_bilateral

    plan = SmoothingPlan(variant="gaussian_k1", variables=("ndvi",))
    plain = smooth(cells_df, plan).toPandas().set_index("cell").sort_index()
    wide = (
        smooth_bilateral(cells_df, plan, sigma_r=1e6)
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    assert np.allclose(
        wide["bilateral_ndvi"].to_numpy(),
        plain["smoothed_ndvi"].to_numpy(),
        atol=2e-6,  # bilateral output is round6'ed
    )
    narrow = (
        smooth_bilateral(cells_df, plan, sigma_r=1e-6)
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    orig = cells_pdf.set_index("cell").sort_index()
    assert np.allclose(
        narrow["bilateral_ndvi"].to_numpy(),
        orig["ndvi"].to_numpy(),
        atol=1e-4,
    )


def test_bilateral_preserves_edges(spark):
    """The operator's reason to exist: on a two-plateau step image the
    bilateral pass keeps BOTH plateaus flat (cross-edge neighbors are
    suppressed by the range kernel) while the plain gaussian pass
    blurs the boundary row by a visible margin."""
    import pandas as pd

    from cuda_gis_smoothing_spark.hexgrid import pack
    from cuda_gis_smoothing_spark.operators.smoothing import smooth_bilateral

    side = 10
    qs, rs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    q = qs.ravel().astype(np.int64)
    r = rs.ravel().astype(np.int64)
    pdf = pd.DataFrame(
        {"cell": pack(q, r), "ndvi": np.where(q < side // 2, 0.1, 0.9)}
    )
    df = spark.createDataFrame(pdf)
    plan = SmoothingPlan(variant="gaussian_k1", variables=("ndvi",))
    bi = (
        smooth_bilateral(df, plan, sigma_r=0.1)
        .toPandas()
        .set_index("cell")
        .sort_index()
    )
    orig = pdf.set_index("cell").sort_index()
    # cross-plateau gap 0.8 with sigma 0.1: exp(-32) ~ 1e-14 — plateaus stay flat
    assert np.allclose(
        bi["bilateral_ndvi"].to_numpy(), orig["ndvi"].to_numpy(), atol=1e-6
    )
    plain = smooth(df, plan).toPandas().set_index("cell").sort_index()
    blur = np.abs(plain["smoothed_ndvi"].to_numpy() - orig["ndvi"].to_numpy())
    assert blur.max() > 0.1  # the plain pass DOES blur the step


def test_idw_fill_hand_computed(spark):
    """A punched-out center cell gets the 1/ring weighted mean of its
    present k-ring; a far isolated cell's phantom neighbors fail the
    min_contributors floor; present cells never appear in the output."""
    import pandas as pd

    from cuda_gis_smoothing_spark.hexgrid import kring_cells, pack
    from cuda_gis_smoothing_spark.operators.smoothing import idw_fill

    side = 7
    qs, rs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    cells = pack(qs.ravel().astype(np.int64), rs.ravel().astype(np.int64))
    hole = int(pack(np.array([3]), np.array([3]))[0])
    iso = int(pack(np.array([100]), np.array([100]))[0])
    keep = cells[cells != hole]
    vals = {int(c): 0.1 + (int(c) % 97) / 100.0 for c in keep}
    vals[iso] = 0.5
    pdf = pd.DataFrame(
        {"cell": list(vals), "ndvi": [vals[c] for c in vals]}
    )
    out = {
        int(r.cell): (int(r.n_contributors), float(r.idw_ndvi))
        for r in idw_fill(spark.createDataFrame(pdf)).collect()
    }
    # the punched-out hole: all 18 k-ring cells present
    ring1 = set(int(c) for c in kring_cells(np.array([hole]), 1, False)[0])
    ring2 = (
        set(int(c) for c in kring_cells(np.array([hole]), 2, False)[0]) - ring1
    )
    num = sum(vals[c] for c in ring1) + sum(0.5 * vals[c] for c in ring2)
    den = len(ring1) + 0.5 * len(ring2)
    n, est = out[hole]
    assert n == 18
    assert abs(est - num / den) < 2e-6
    # no present cell is ever re-estimated
    assert not (set(out) & set(vals))
    # the isolated cell's phantom neighbors have exactly 1 contributor
    # each -> all below the min_contributors floor of 3
    assert not any(
        c in out for c in kring_cells(np.array([iso]), 2, False)[0]
    )
