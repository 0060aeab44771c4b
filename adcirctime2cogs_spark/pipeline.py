"""End-to-end pipeline: the Spark-first equivalent of the reference CLI
(run/adcircTime2cogs.py:242-279 argparse -> main() :121-240).

    mesh+timeseries tables -> bbox agg -> grid spec -> weights (once)
      -> all-ts regrid -> COG per ts -> mosaic sidecars -> zip

Differences from the reference, by design (SURVEY §3.1 mapping):
- one lazy DataFrame DAG instead of a sequential per-timestep loop;
  the COG sink fans out one task per timestep (SURVEY P9);
- weights computed once and reused across every timestep/variable
  (the reference rebuilds its interpolator per step, P6);
- input is the engine-native parquet layout (sources/mesh.py); NetCDF
  enters through sources/netcdf.netcdf_to_parquet.

CLI (mirrors the reference's 5 args):
    python -m adcirctime2cogs_spark.pipeline \
        --input-dir DIR --output-dir DIR --final-dir DIR \
        --input-file NAME --input-variable VAR [--res DEG]
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass

from pyspark.sql import SparkSession

from adcirctime2cogs_spark.plans.grid import (
    bounding_box,
    grid_spec_from_bbox,
    raster_cells,
)
from adcirctime2cogs_spark.plans.regrid import regrid
from adcirctime2cogs_spark.plans.weights import build_weights
from adcirctime2cogs_spark.sinks.cog import write_cogs
from adcirctime2cogs_spark.sinks.sidecar import archive_output, write_mosaic_sidecars
from adcirctime2cogs_spark.sources.mesh import load_mesh, load_timeseries


@dataclass
class PipelineResult:
    n_timesteps: int
    n_cells: int
    cog_dir: str
    archive: str
    sidecars: list[str]
    uploaded: bool = False
    timings: dict | None = None  # per-phase wall seconds


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    final_dir: str,
    variable: str,
    res: float,
    bin_size_cells: float = 4.0,
    s3_bucket: str | None = None,
    s3_client=None,
) -> PipelineResult:
    """The whole dataflow; returns a small result summary (files are
    the real output, like the reference) plus per-phase wall timings
    (weights build / regrid+COG / sidecars+zip) so scale runs can
    attribute cost without re-instrumenting."""
    import time

    timings: dict[str, float] = {}
    t0 = time.time()
    nodes, elements = load_mesh(spark, input_dir)
    tsv = load_timeseries(spark, input_dir, variable)

    bbox = bounding_box(nodes)  # O7
    spec = grid_spec_from_bbox(bbox, res)  # D4
    cells = raster_cells(spark, spec)  # O11
    timings["load_bbox"] = round(time.time() - t0, 2)
    t0 = time.time()

    # bin size ~ a few cell widths (SURVEY §7 "what's hard")
    weights = build_weights(cells, nodes, elements, bin_size=res * bin_size_cells)
    weights = weights.cache()  # O13-O15, hoisted once (P6)
    # materialize the cache now: the regrid action then reuses it, and
    # the weights build gets its own wall-clock attribution for free
    weights.count()
    timings["weights"] = round(time.time() - t0, 2)
    t0 = time.time()
    try:
        return _run_after_weights(
            weights, tsv, spec, output_dir, final_dir, variable,
            s3_bucket, s3_client, timings, t0,
        )
    finally:
        # unpersist even when a sink phase throws — a long-lived
        # session running many pipelines would otherwise pin one full
        # weights table per failed run (review r11)
        weights.unpersist()


def _run_after_weights(
    weights, tsv, spec, output_dir, final_dir, variable,
    s3_bucket, s3_client, timings, t0,
) -> "PipelineResult":
    """Sink phases of run_pipeline, split out so the caller can wrap
    them in try/finally around the weights cache (review r11)."""
    import time

    # parquet-metadata count: broadcast the node values (skipping the
    # node_id shuffle of the exploded weights) when the whole slice
    # fits executor memory; an HSOFS 85-step forecast is ~1.2 GB, so
    # long runs fall back to the shuffle join automatically
    broadcast_ts = tsv.count() * 16 < 64 * 1024 * 1024
    raster_long = regrid(weights, tsv, broadcast_ts=broadcast_ts)  # O16-O17

    cog_dir = os.path.join(output_dir, variable)
    manifest = write_cogs(raster_long, spec, cog_dir, prefix=variable).collect()
    timings["regrid_cog"] = round(time.time() - t0, 2)
    t0 = time.time()

    sidecars = write_mosaic_sidecars(cog_dir, f"{variable}_mosaic")  # O21
    archive = archive_output(cog_dir, final_dir)  # O22
    timings["sidecar_zip"] = round(time.time() - t0, 2)
    uploaded = False
    if s3_bucket:
        # O23 (reference run/utilities/s3_utilities.py:33-49): ensure
        # the bucket, ship the archive; a failed upload is non-fatal
        # exactly like the reference's sidecar-upload contract
        from adcirctime2cogs_spark.sinks.sidecar import (
            ensure_bucket,
            upload_to_s3,
        )

        ensure_bucket(s3_bucket, client=s3_client)
        uploaded = upload_to_s3(
            s3_bucket,
            os.path.basename(archive),
            archive,
            client=s3_client,
        )

    return PipelineResult(
        n_timesteps=len(manifest),
        n_cells=sum(r.n_cells for r in manifest),
        cog_dir=cog_dir,
        archive=archive,
        sidecars=sidecars,
        uploaded=uploaded,
        timings=timings,
    )


def load_config_yaml(path: str) -> dict:
    """Driver-side YAML job config (reference O26,
    run/utilities/utilities.py:74-89 load_config / readConfigYml — job
    params, never data). Gated: PyYAML may be absent in this image."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise RuntimeError("--config requires PyYAML") from exc
    with open(path) as fh:
        out = yaml.safe_load(fh)
    if not isinstance(out, dict):
        raise ValueError(f"config {path} must be a YAML mapping")
    return out


_ARG_DEFAULTS = {
    "input_dir": None,
    "output_dir": None,
    "final_dir": None,
    "input_file": "timeseries",
    "input_variable": "timeseries",
    "res": 0.005,
    "s3_bucket": None,
}


def main(argv: list[str] | None = None) -> int:
    # argument_default=SUPPRESS: an unset flag is ABSENT from the
    # namespace, so a flag explicitly set to its default value (e.g.
    # --res 0.005) is distinguishable from an unset one — "CLI flags
    # win over YAML" holds for default-valued flags too. Precedence:
    # CLI > YAML > _ARG_DEFAULTS.
    p = argparse.ArgumentParser(
        description=__doc__, argument_default=argparse.SUPPRESS
    )
    p.add_argument("--config", help="YAML file holding any of the flags below")
    p.add_argument("--input-dir")
    p.add_argument("--output-dir")
    p.add_argument("--final-dir")
    p.add_argument("--input-file")
    p.add_argument("--input-variable")
    p.add_argument("--res", type=float)
    p.add_argument("--s3-bucket")
    # every flag except --config must have a _ARG_DEFAULTS entry, or an
    # unset flag would be absent from the namespace (argument_default=
    # SUPPRESS) and blow up with AttributeError at first use
    undeclared = {
        a.dest for a in p._actions if a.dest not in ("help", "config")
    } - _ARG_DEFAULTS.keys()
    assert not undeclared, f"flags missing from _ARG_DEFAULTS: {sorted(undeclared)}"
    args = p.parse_args(argv)
    ns = vars(args)

    config = ns.pop("config", None)
    if config:
        # YAML values bypass argparse's per-flag type= coercion, so a
        # quoted numeric (res: "0.005") would flow through as a string
        # and TypeError deep inside run_pipeline — coerce here with
        # the same converter the CLI flag declares, failing fast
        coerce = {
            a.dest: a.type for a in p._actions if a.type is not None
        }
        for key, val in load_config_yaml(config).items():
            attr = key.replace("-", "_")
            if attr in _ARG_DEFAULTS and attr not in ns:
                conv = coerce.get(attr)
                if conv is not None and val is not None:
                    try:
                        val = conv(val)
                    except (TypeError, ValueError):
                        p.error(f"config {key}: invalid value {val!r}")
                ns[attr] = val
    for key, val in _ARG_DEFAULTS.items():
        ns.setdefault(key, val)
    missing = [k for k in ("input_dir", "output_dir", "final_dir")
               if getattr(args, k) is None]
    if missing:
        p.error(f"missing required: {', '.join(m.replace('_', '-') for m in missing)}")

    # mirror load_timeseries' max-variable dispatch: max vars live in
    # node_maxes.parquet, so probing {variable}.parquet would reject
    # every valid max-variable run at the CLI door
    import re as _re

    probe_name = (
        "node_maxes" if _re.search("max", args.input_variable)
        else args.input_variable
    )
    probe = os.path.join(args.input_dir, f"{probe_name}.parquet")
    nc_input = os.path.join(args.input_dir, args.input_file)
    base_dir = args.input_dir
    spark = None
    if not os.path.exists(probe):
        staging = os.path.join(args.output_dir, "_tables")
        staged_probe = os.path.join(staging, f"{probe_name}.parquet")

        def _staging_fresh() -> bool:
            # reuse only when the staged tables postdate the .nc input
            # (an updated forecast file must re-convert)
            try:
                return os.path.getmtime(staged_probe) >= os.path.getmtime(
                    nc_input
                )
            except OSError:
                return os.path.exists(staged_probe)

        if os.path.exists(staged_probe) and _staging_fresh():
            # a previous run of the same .nc job already converted into
            # the staging dir — reuse it instead of re-decoding the
            # whole NetCDF (review r11: the probe only checked
            # input_dir, so every re-run paid the full ingest again)
            base_dir = staging
        elif args.input_file.endswith(".nc") and os.path.exists(nc_input):
            # the reference's actual entry point: ONE fort.*.nc carrying
            # mesh + variable (run/adcircTime2cogs.py:148-156). Convert
            # into a staging table set under output-dir with the
            # built-in classic-NetCDF codecs, then run the normal
            # parquet pipeline against it.
            from adcirctime2cogs_spark.session import get_spark
            from adcirctime2cogs_spark.sources.netcdf import (
                adcirc_nc_to_tables,
            )

            spark = get_spark(app_name="adcirctime2cogs_pipeline")
            base_dir = staging
            adcirc_nc_to_tables(
                spark, nc_input, base_dir, args.input_variable
            )
        elif args.input_file.startswith("swan"):
            # the reference's conditional dispatch (O28,
            # run/adcircTime2cogs.py:270-279): missing swan inputs
            # soft-exit
            print(f"swan input {probe} absent; nothing to do", file=sys.stderr)
            return 0
        else:
            print(f"input not found: {probe}", file=sys.stderr)
            return 1

    if spark is None:
        from adcirctime2cogs_spark.session import get_spark

        spark = get_spark(app_name="adcirctime2cogs_pipeline")
    result = run_pipeline(
        spark,
        base_dir,
        args.output_dir,
        args.final_dir,
        args.input_variable,
        args.res,
        s3_bucket=args.s3_bucket,
    )
    print(
        f"wrote {result.n_timesteps} COGs ({result.n_cells} cells) to "
        f"{result.cog_dir}; archive {result.archive}"
        + (" (uploaded)" if result.uploaded else "")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
