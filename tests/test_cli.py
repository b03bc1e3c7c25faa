"""CLI command tests (click runner)."""
import numpy as np
import pytest
from click.testing import CliRunner

from multimesh_tpu import testing as mmt
from multimesh_tpu.cli import cli
from multimesh_tpu.io import Exodus, SalvusMesh
from multimesh_tpu.io.exodus import write_exodus


@pytest.fixture
def exodus_pair(tmp_path):
    a = mmt.box_mesh(shape=(4, 4, 4), order=1)
    b = mmt.box_mesh(shape=(3, 3, 3), order=1, extent=[(0.05, 0.95)] * 3)
    pa, pb = tmp_path / "a.e", tmp_path / "b.e"
    base = mmt.smooth_field(a.vertices, "linear")
    params = ["VPV", "VPH", "VSV", "VSH", "RHO", "ETA", "QKAPPA", "QMU"]
    write_exodus(pa, a.vertices, a.connectivity,
                 {p: base * (1 + 0.05 * i) for i, p in enumerate(params)})
    write_exodus(pb, b.vertices, b.connectivity,
                 {p: np.zeros(len(b.vertices)) for p in params})
    return a, b, pa, pb


def test_cli_help():
    r = CliRunner().invoke(cli, ["--help"])
    assert r.exit_code == 0
    for cmd in ("interpolate-mesh-a-to-b", "interpolate-mesh-to-gll",
                "interpolate-gll-to-mesh"):
        assert cmd in r.output


def test_cli_mesh_a_to_b(exodus_pair):
    a, b, pa, pb = exodus_pair
    r = CliRunner().invoke(
        cli,
        ["interpolate-mesh-a-to-b", "--mesh_a", str(pa), "--mesh_b",
         str(pb), "--params", "TTI"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert "Finished in time" in r.output
    out = Exodus(pb)
    truth = mmt.smooth_field(b.vertices, "linear")
    np.testing.assert_allclose(out.get_nodal_field("VPV"), truth,
                               atol=1e-9)
    # a non-unit-scale parameter too, so per-parameter routing is real
    # (fixture scales are 1 + 0.05*i over the TTI list)
    names = out.nodal_parameters
    i_vsv = names.index("VSV")
    np.testing.assert_allclose(
        out.get_nodal_field("VSV"), truth * (1 + 0.05 * i_vsv), atol=1e-9
    )


def test_cli_mesh_to_gll_and_back(tmp_path, exodus_pair):
    a, b, pa, pb = exodus_pair
    gll_mesh = mmt.box_mesh(shape=(2, 2, 2), order=4,
                            extent=[(0.1, 0.9)] * 3)
    pg = tmp_path / "g.h5"
    mmt.write_salvus_fixture(pg, gll_mesh, parameters=("VPV", "VSV"))

    r = CliRunner().invoke(
        cli,
        ["interpolate-mesh-to-gll", "--mesh", str(pa), "--gll_model",
         str(pg), "--params", "VPV,VSV"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    out = SalvusMesh(pg, fast_mode=False)
    truth = mmt.smooth_field(gll_mesh.points, "linear")
    np.testing.assert_allclose(out.element_nodal_fields["VPV"], truth,
                               atol=1e-9)

    # back-transfer target mesh must lie inside the GLL model's domain
    # (exterior points take the fixed-ref fallback by design)
    c = mmt.box_mesh(shape=(3, 3, 3), order=1, extent=[(0.15, 0.85)] * 3)
    pc = tmp_path / "c.e"
    write_exodus(pc, c.vertices, c.connectivity,
                 {p: np.zeros(len(c.vertices)) for p in ("VPV", "VSV")})
    r = CliRunner().invoke(
        cli,
        ["interpolate-gll-to-mesh", "--mesh", str(pc), "--gll_model",
         str(pg)],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    out_e = Exodus(pc)
    truth_c = mmt.smooth_field(c.vertices, "linear")
    np.testing.assert_allclose(out_e.get_nodal_field("VPV"), truth_c,
                               atol=1e-8)
