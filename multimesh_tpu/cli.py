"""Command-line interface.

Same three commands as the reference's console script
(reference multi_mesh/scripts/cli.py: interpolate_mesh_a_to_b at :35,
interpolate_mesh_to_gll at :107, interpolate_gll_to_mesh at :260), built
on the shared engine instead of private copies of the helpers -- and
without the reference's NameError bugs in interpolate_gll_to_mesh
(reference cli.py:317-319 uses an undefined variable; the intended
behavior, interpolating the GLL file's labeled parameters onto the mesh
nodes, is implemented here).

Entry point:  python -m multimesh_tpu.cli <command> [options]
(installed as ``multimesh_tpu`` via setup.py, matching the reference's
``multi_mesh`` console script.)
"""
from __future__ import annotations

import time

import click


def _report(start: float):
    runtime = time.time() - start
    if runtime >= 60:
        click.echo(f"Finished in time: {runtime / 60:.3f} minutes")
    else:
        click.echo(f"Finished in time: {runtime:.3f} seconds")


@click.group()
@click.option(
    "--platform",
    type=click.Choice(["auto", "cpu", "tpu"]),
    default=None,
    help="Force the JAX platform (default: auto / $MMT_PLATFORM). Small "
    "meshes are often faster on cpu than paying accelerator compile "
    "latency.",
)
def cli(platform):
    """multimesh_tpu -- TPU-native mesh-to-mesh interpolation."""
    import os

    platform = platform or os.environ.get("MMT_PLATFORM")
    if platform and platform != "auto":
        import jax

        jax.config.update("jax_platforms", platform)


@cli.command()
@click.option("--mesh_a", help="Exodus file to interpolate from.",
              required=True)
@click.option("--mesh_b", help="Exodus file to interpolate onto.",
              required=True)
@click.option("--params", help="Comma-separated parameters or TTI/ISO.",
              default="TTI", show_default=True)
def interpolate_mesh_a_to_b(mesh_a, mesh_b, params):
    """Interpolate nodal values from exodus mesh A onto exodus mesh B
    (3D hex meshes)."""
    from .engine import exodus_2_exodus

    start = time.time()
    # strip whitespace and empty entries ("VP, VS" / trailing comma)
    params = (
        [q.strip() for q in params.split(",") if q.strip()]
        if "," in params
        else params.strip()
    )
    exodus_2_exodus(mesh_a=mesh_a, mesh_b=mesh_b, parameters=params)
    _report(start)


@cli.command()
@click.option("--mesh", help="Exodus file with nodal parameters.",
              required=True)
@click.option("--gll_model", help="HDF5 GLL mesh to write onto.",
              required=True)
@click.option("--gll_order", help="Polynomial order of the GLL model.",
              default=4, show_default=True, type=int)
@click.option("--params", help="Comma-separated parameters or TTI/ISO.",
              default="TTI", show_default=True)
def interpolate_mesh_to_gll(mesh, gll_model, gll_order, params):
    """Interpolate from an exodus mesh onto a GLL (smoothiesem) model."""
    from .engine import exodus_2_gll

    start = time.time()
    # strip whitespace and empty entries ("VP, VS" / trailing comma)
    params = (
        [q.strip() for q in params.split(",") if q.strip()]
        if "," in params
        else params.strip()
    )
    exodus_2_gll(
        mesh=mesh, gll_model=gll_model, gll_order=gll_order,
        parameters=params,
    )
    _report(start)


@cli.command()
@click.option("--mesh", help="Exodus file to receive nodal parameters.",
              required=True)
@click.option("--gll_model", help="HDF5 GLL mesh to read from.",
              required=True)
@click.option("--gll_order", help="Polynomial order of the GLL model.",
              default=4, show_default=True, type=int)
def interpolate_gll_to_mesh(mesh, gll_model, gll_order):
    """Interpolate parameters stored on a GLL model onto a nodal exodus
    mesh (parameters taken from the GLL file's dimension labels)."""
    from .engine import gll_2_exodus

    start = time.time()
    gll_2_exodus(gll_model=gll_model, exodus_model=mesh,
                 gll_order=gll_order)
    _report(start)


if __name__ == "__main__":
    cli()
