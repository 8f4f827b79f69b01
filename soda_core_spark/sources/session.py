"""SparkSession acquisition — the four connection modes of the reference's
SparkDataFrame data source (soda-sparkdf sparkdf_data_source.py:224-274):

* **existing**: the caller hands over a live session,
* **active**: pick up the thread-local active session (the notebook's
  ``spark``) — no URI, no credentials,
* **remote**: Spark Connect — ``sc://host:443;use_ssl=true;token=…`` gRPC
  URI, for pointing this engine at a real cluster,
* **new**: build a local session.

All modes pin the session timezone to UTC — the engine's timestamp
arithmetic (freshness, NOW variables, parquet timestamp literals) assumes
it, exactly like the reference issues ``SET TIME ZONE 'UTC'`` on every
session it creates.
"""

from __future__ import annotations

from typing import Optional


def build_remote_uri(
    host: str,
    token: Optional[str] = None,
    cluster_id: Optional[str] = None,
    port: int = 443,
    use_ssl: bool = True,
) -> str:
    """Spark Connect URI. ``token`` becomes a gRPC bearer header (handled
    by pyspark's ChannelBuilder); ``x-databricks-cluster-id`` rides as
    gRPC metadata. Keep the result in a local variable — it embeds the
    secret, never log it (reference :249-256)."""
    host = host.removeprefix("sc://").rstrip("/")
    if ":" not in host:  # don't double a port the host already carries
        host = f"{host}:{port}"
    parts = [f"sc://{host}/"]
    if use_ssl:
        parts.append(";use_ssl=true")
    if token:
        parts.append(f";token={token}")
    if cluster_id:
        parts.append(f";x-databricks-cluster-id={cluster_id}")
    return "".join(parts)


def get_session(
    existing=None,
    use_active: bool = False,
    remote: Optional[str] = None,
    token: Optional[str] = None,
    cluster_id: Optional[str] = None,
    app_name: str = "soda_core_spark",
    local_cpus: Optional[str] = None,
):
    """Resolve a SparkSession by mode precedence: existing > active >
    remote (Spark Connect) > new local. Raises with an actionable message
    when ``use_active`` finds nothing (reference :236-245)."""
    from pyspark.sql import SparkSession

    if existing is not None:
        return existing
    if use_active:
        session = SparkSession.getActiveSession()
        if session is None:
            raise ValueError(
                "use_active_session requested but no active SparkSession was "
                "found. Build one first (SparkSession.builder...getOrCreate()), "
                "or pass an existing session, a remote sc:// URI, or local_cpus "
                "for a new local session."
            )
        return session
    if remote is not None:
        if ";" in remote:
            uri = remote  # full Spark Connect URI, pass through untouched
        elif token is None and cluster_id is None and remote.startswith("sc://"):
            uri = remote  # bare sc://host[:port] — already a valid target
        else:
            uri = build_remote_uri(remote, token=token, cluster_id=cluster_id)
        session = SparkSession.builder.remote(uri).getOrCreate()
        session.sql("SET TIME ZONE 'UTC'")
        return session
    from soda_core_spark.cli import build_session

    return build_session(app_name=app_name, cpus=local_cpus)
