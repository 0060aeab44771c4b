"""GeoServer image-mosaic sidecar + archive sinks (SURVEY O21-O22).

Driver-side metadata writes after the distributed COG job — tiny
key=value files, exactly the reference's three properties files
(run/adcircTime2cogs.py:211-222) and the zip step (:224-237, minus its
NameError bug in the error path at :229).
"""

from __future__ import annotations

import os
import shutil

# the reference's mosaic time regex (run/adcircTime2cogs.py:216)
TIME_REGEX = "[0-9]{8}T[0-9]{6}"


def write_mosaic_sidecars(out_dir: str, mosaic_name: str) -> list[str]:
    """indexer/timeregex/datastore properties for a GeoServer image
    mosaic over the per-timestep COGs. datastore connection params come
    from ADCIRC_DB_* env vars like the reference's env-based config
    (run/adcircTime2cogs.py:218-222)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []

    indexer = os.path.join(out_dir, "indexer.properties")
    with open(indexer, "w") as f:
        f.write(
            "TimeAttribute=ingestion\n"
            "Schema=*the_geom:Polygon,location:String,ingestion:java.util.Date\n"
            f"PropertyCollectors=TimestampFileNameExtractorSPI[timeregex](ingestion)\n"
            f"Name={mosaic_name}\n"
        )
    paths.append(indexer)

    timeregex = os.path.join(out_dir, "timeregex.properties")
    with open(timeregex, "w") as f:
        f.write(f"regex={TIME_REGEX}\n")
    paths.append(timeregex)

    datastore = os.path.join(out_dir, "datastore.properties")
    with open(datastore, "w") as f:
        f.write(
            "SPI=org.geotools.data.postgis.PostgisNGDataStoreFactory\n"
            f"host={os.environ.get('ADCIRC_DB_HOST', 'localhost')}\n"
            f"port={os.environ.get('ADCIRC_DB_PORT', '5432')}\n"
            f"database={os.environ.get('ADCIRC_DB_DATABASE', 'postgres')}\n"
            f"schema={os.environ.get('ADCIRC_DB_SCHEMA', 'public')}\n"
            f"user={os.environ.get('ADCIRC_DB_USER', 'postgres')}\n"
            f"passwd={os.environ.get('ADCIRC_DB_PASSWORD', '')}\n"
            "Loose\\ bbox=true\nEstimated\\ extends=false\nvalidate\\ "
            "connections=true\nConnection\\ timeout=10\npreparedStatements=true\n"
        )
    paths.append(datastore)
    return paths


def archive_output(out_dir: str, final_dir: str, remove_source: bool = False) -> str:
    """Zip the COG output dir into final_dir (reference O22). Unlike the
    reference, the target dir is created BEFORE the zip that writes into
    it (the reference orders mkdir after, run/adcircTime2cogs.py:240)."""
    os.makedirs(final_dir, exist_ok=True)
    base = os.path.join(final_dir, os.path.basename(out_dir.rstrip("/")))
    path = shutil.make_archive(base, "zip", out_dir)
    if remove_source:
        shutil.rmtree(out_dir)
    return path


def _default_s3_client():
    """boto3 is absent in this container -> gated import; data-path S3
    writes go through spark's s3a committer instead."""
    try:
        import boto3
    except ImportError as exc:
        raise NotImplementedError(
            "boto3 not available in this environment; artifact upload "
            "requires a boto3-equipped host (data paths use s3a://)."
        ) from exc
    return boto3.client("s3")


def bucket_exists(bucket: str, client=None) -> bool:
    """True iff the bucket is listed for this account (reference
    run/utilities/s3_utilities.py:33-35 membership test)."""
    client = client or _default_s3_client()
    names = [b["Name"] for b in client.list_buckets().get("Buckets", [])]
    return bucket in names


def ensure_bucket(bucket: str, region: str = "us-east-2", client=None):
    """Create the bucket if missing, with the region pinned via
    LocationConstraint (reference s3_utilities.py:37-41; region default
    from its load_config, :30)."""
    client = client or _default_s3_client()
    if bucket_exists(bucket, client):
        return None
    if region in (None, "us-east-1"):
        # S3 rejects CreateBucketConfiguration for the default region
        # (InvalidLocationConstraint) — it must be omitted entirely
        return client.create_bucket(Bucket=bucket)
    return client.create_bucket(
        Bucket=bucket,
        CreateBucketConfiguration={"LocationConstraint": region},
    )


def upload_to_s3(bucket: str, key: str, path: str, client=None) -> bool:
    """S3 artifact upload (reference O23, run/utilities/s3_utilities.py:
    43-49): public-read ACL, False on client error rather than raising —
    the reference treats a failed sidecar upload as non-fatal."""
    client = client or _default_s3_client()
    try:
        client.upload_file(
            path, bucket, key, ExtraArgs={"ACL": "public-read"}
        )
    except Exception:
        return False
    return True
