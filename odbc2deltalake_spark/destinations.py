"""Object-store destinations: scheme-specific option mapping for the two
planes a Spark table store runs on.

The reference ships concrete destination plumbing for Azure and
Databricks (reference:odbc2deltalake/destination/azure.py:8-79,
reference:odbc2deltalake/destination/databricks.py:6-72) whose job is to
turn ONE user-facing ``storage_options`` dict into each consumer's
dialect (reference:odbc2deltalake/destination/azure_utils.py:41-80
``convert_options`` with "fsspec" / "object_store" flavors). The
Spark-native equivalent has two consumers:

- **data plane** — Spark executors read/write parquet through Hadoop
  filesystems, configured by ``fs.azure.*`` / ``fs.s3a.*`` keys
  (:meth:`Destination.spark_options`, applied by
  :meth:`Destination.apply_to_spark`). These are public hadoop-azure /
  hadoop-aws configuration keys.
- **metadata plane** — the commit log (tablestore.py) does small-file
  text I/O through fsspec (:meth:`Destination.fsspec_options` →
  :meth:`Destination.storage_backend` returning a
  :class:`FsspecStorageBackend`), or through ``dbutils.fs`` on
  Databricks where cluster credentials make explicit options moot.

No object-store driver (adlfs/s3fs) nor hadoop-azure jar ships in this
container, so construction and option mapping are fully unit-tested
(credentials-shaped dicts in, exact config keys out) while the network
clients stay import-gated — same seam as FsspecStorageBackend itself.
"""

from __future__ import annotations

from typing import Any, Optional

from odbc2deltalake_spark.tablestore import FsspecStorageBackend, StorageBackend

__all__ = [
    "Destination",
    "AzureDestination",
    "S3Destination",
    "DatabricksDestination",
    "DbutilsStorageBackend",
    "parse_destination",
]


class Destination:
    """A storage location the engine can write a table to: a URI for the
    Spark data plane plus derived option dialects. Mirrors the reference's
    Destination ABC surface (path algebra via ``/``, ``__str__``) without
    its deltalake coupling."""

    scheme: str = "file"

    def __init__(self, path: str, storage_options: Optional[dict] = None):
        self.path = path.rstrip("/")
        self.storage_options = dict(storage_options or {})

    # -- path algebra (reference:destination/destination.py __truediv__) --
    def __truediv__(self, other: str) -> "Destination":
        child = self.__class__.__new__(self.__class__)
        child.__dict__.update(self.__dict__)
        child.path = self.path + "/" + other.strip("/")
        return child

    def uri(self) -> str:
        return self.path

    def __str__(self) -> str:
        return self.uri()

    # -- option dialects ------------------------------------------------
    def spark_options(self) -> dict[str, str]:
        """Hadoop configuration key/values for the Spark data plane."""
        return {}

    def fsspec_options(self) -> dict[str, Any]:
        """kwargs for ``fsspec.filesystem(self.scheme, **opts)``."""
        return dict(self.storage_options)

    def apply_to_spark(self, spark) -> None:
        for k, v in self.spark_options().items():
            spark.conf.set(k, v)

    def storage_backend(self, allow_nonatomic: bool = False) -> StorageBackend:
        """Metadata-plane backend for VersionedParquetTable. Import-gated:
        raises ImportError where the fsspec driver isn't installed."""
        import fsspec  # noqa: PLC0415 — optional dependency

        fs = fsspec.filesystem(self.scheme, **self.fsspec_options())
        return FsspecStorageBackend(fs, allow_nonatomic=allow_nonatomic)


class AzureDestination(Destination):
    """ADLS Gen2 / Blob destination (``abfss://container@account.dfs.core.
    windows.net/path``).

    ``storage_options`` uses the reference's vocabulary
    (reference:odbc2deltalake/destination/azure.py:9 takes the same dict):
    ``account_name``, ``account_key``, ``sas_token``, ``client_id`` /
    ``client_secret`` / ``tenant_id`` (OAuth), ``anon``, ``use_emulator``.
    """

    scheme = "az"

    def __init__(
        self,
        container: str,
        path: str,
        storage_options: Optional[dict] = None,
        account_name: Optional[str] = None,
    ):
        super().__init__(path.strip("/"), storage_options)
        self.container = container
        self.account_name = account_name or self.storage_options.get("account_name")

    @property
    def host(self) -> Optional[str]:
        """Full DFS endpoint host. A dotted ``account_name`` is taken
        verbatim — sovereign/government clouds use different suffixes
        (e.g. ``.dfs.core.usgovcloudapi.net``), and rebuilding against
        the public-cloud suffix would route data (and credentials) to
        the wrong, possibly attacker-registerable, endpoint."""
        if not self.account_name:
            return None
        if "." in self.account_name:
            return self.account_name
        return f"{self.account_name}.dfs.core.windows.net"

    def uri(self) -> str:
        if self.account_name:
            return f"abfss://{self.container}@{self.host}/{self.path}"
        return f"az://{self.container}/{self.path}"

    def spark_options(self) -> dict[str, str]:
        """hadoop-azure (ABFS) auth configs, keyed per storage account so
        two destinations on different accounts coexist in one session."""
        o = self.storage_options
        host = self.host
        if not host:
            return {}
        out: dict[str, str] = {}
        if "account_key" in o:
            out[f"fs.azure.account.auth.type.{host}"] = "SharedKey"
            out[f"fs.azure.account.key.{host}"] = str(o["account_key"])
        elif "sas_token" in o:
            out[f"fs.azure.account.auth.type.{host}"] = "SAS"
            out[f"fs.azure.sas.token.provider.type.{host}"] = (
                "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider"
            )
            out[f"fs.azure.sas.fixed.token.{host}"] = str(o["sas_token"])
        elif "client_id" in o and "client_secret" in o and "tenant_id" in o:
            out[f"fs.azure.account.auth.type.{host}"] = "OAuth"
            out[f"fs.azure.account.oauth.provider.type.{host}"] = (
                "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
            )
            out[f"fs.azure.account.oauth2.client.id.{host}"] = str(o["client_id"])
            out[f"fs.azure.account.oauth2.client.secret.{host}"] = str(o["client_secret"])
            out[f"fs.azure.account.oauth2.client.endpoint.{host}"] = (
                f"https://login.microsoftonline.com/{o['tenant_id']}/oauth2/token"
            )
        return out

    def fsspec_options(self) -> dict[str, Any]:
        """adlfs kwargs, following the reference's fsspec flavor
        (azure_utils.py:48-62): emulator short-circuits to its well-known
        connection string; otherwise default ``anon=False`` when real
        credentials are present (fsspec's anon-by-default is a footgun the
        reference also papers over)."""
        o = self.storage_options
        use_emulator = str(o.get("use_emulator", "0")).lower() in ("1", "true")
        if use_emulator and "connection_string" not in o:
            return {
                "connection_string": (
                    "DefaultEndpointsProtocol=http;AccountName=devstoreaccount1;"
                    "AccountKey=Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVEr"
                    "Cz4I6tq/K1SZFPTOtr/KBHBeksoGMGw==;"
                    "BlobEndpoint=http://127.0.0.1:10000/devstoreaccount1;"
                    "QueueEndpoint=http://127.0.0.1:10001/devstoreaccount1;"
                    "TableEndpoint=http://127.0.0.1:10002/devstoreaccount1;"
                )
            }
        out = {k: v for k, v in o.items() if k != "use_emulator"}
        if (
            "account_name" in out
            and not any(k in out for k in ("account_key", "anon", "sas_token", "token"))
        ):
            out["anon"] = False
        return out


class S3Destination(Destination):
    """S3 / S3-compatible destination (``s3a://bucket/path`` to Spark,
    ``s3://`` to fsspec). ``storage_options``: ``access_key_id`` /
    ``secret_access_key`` / ``session_token``, ``endpoint_url``,
    ``region``, ``anon``, ``path_style`` (for MinIO-style stores)."""

    scheme = "s3"

    def __init__(self, bucket: str, path: str, storage_options: Optional[dict] = None):
        super().__init__(path.strip("/"), storage_options)
        self.bucket = bucket

    def uri(self) -> str:
        # s3a:// — the hadoop-aws connector scheme Spark executors use
        return f"s3a://{self.bucket}/{self.path}"

    def spark_options(self) -> dict[str, str]:
        o = self.storage_options
        bucket_ns = f"fs.s3a.bucket.{self.bucket}"
        out: dict[str, str] = {}
        if "access_key_id" in o:
            out[f"{bucket_ns}.access.key"] = str(o["access_key_id"])
        if "secret_access_key" in o:
            out[f"{bucket_ns}.secret.key"] = str(o["secret_access_key"])
        if "session_token" in o:
            out[f"{bucket_ns}.session.token"] = str(o["session_token"])
            out[f"{bucket_ns}.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
        if "endpoint_url" in o:
            out[f"{bucket_ns}.endpoint"] = str(o["endpoint_url"])
        if "region" in o:
            out[f"{bucket_ns}.endpoint.region"] = str(o["region"])
        if str(o.get("path_style", "")).lower() in ("1", "true"):
            out[f"{bucket_ns}.path.style.access"] = "true"
        if str(o.get("anon", "")).lower() in ("1", "true"):
            out[f"{bucket_ns}.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
            )
        return out

    def fsspec_options(self) -> dict[str, Any]:
        o = self.storage_options
        out: dict[str, Any] = {}
        if "access_key_id" in o:
            out["key"] = o["access_key_id"]
        if "secret_access_key" in o:
            out["secret"] = o["secret_access_key"]
        if "session_token" in o:
            out["token"] = o["session_token"]
        if str(o.get("anon", "")).lower() in ("1", "true"):
            out["anon"] = True
        client_kwargs: dict[str, Any] = {}
        if "endpoint_url" in o:
            client_kwargs["endpoint_url"] = o["endpoint_url"]
        if "region" in o:
            client_kwargs["region_name"] = o["region"]
        if client_kwargs:
            out["client_kwargs"] = client_kwargs
        return out


class DbutilsStorageBackend(StorageBackend):
    """Metadata plane over ``dbutils.fs`` (Databricks cluster credentials
    — no explicit options, matching
    reference:odbc2deltalake/destination/databricks.py:35 which writes
    through dbutils instead of an authenticated fs client).

    dbutils has no exclusive-create, so the commit-log's single-writer
    guarantee must come from the table lease lock (plans/destination.py);
    ``exclusive_is_native`` is False by construction and the non-atomic
    check-then-put requires the same explicit opt-in as the fsspec
    fallback."""

    def __init__(self, dbutils, allow_nonatomic: bool = False):
        self.dbutils = dbutils
        self.exclusive_is_native = False
        self.allow_nonatomic = allow_nonatomic

    def list_dir(self, path: str) -> list[str]:
        try:
            return [f.name.rstrip("/") for f in self.dbutils.fs.ls(path)]
        except Exception:
            return []

    def read_text(self, path: str) -> str:
        # dbutils.fs.head caps at its maxBytes argument. Typical commit
        # records are <4KB, but a per-file-stats compaction over many
        # files can reach megabytes — a silently truncated read would
        # corrupt every later snapshot replay, so read with a high cap
        # and FAIL LOUDLY if the result fills it (possible truncation).
        cap = 64 * 1024 * 1024
        text = self.dbutils.fs.head(path, cap)
        if len(text.encode("utf-8", errors="ignore")) >= cap:
            raise IOError(
                f"{path} is >= {cap} bytes — dbutils.fs.head would "
                "truncate it; raise the cap or vacuum/compact with "
                "fewer per-file stats"
            )
        return text

    def write_text_atomic(self, path: str, text: str) -> None:
        self.dbutils.fs.put(path, text, overwrite=True)

    def write_text_exclusive(self, path: str, text: str) -> None:
        from odbc2deltalake_spark.tablestore import CommitConflictError

        if not self.allow_nonatomic:
            raise CommitConflictError(
                f"{path}: dbutils.fs has no exclusive create; enable the "
                "table lease lock and pass allow_nonatomic=True"
            )
        if self.exists(path):
            raise CommitConflictError(path)
        self.dbutils.fs.put(path, text, overwrite=False)

    def exists(self, path: str) -> bool:
        try:
            self.dbutils.fs.ls(path)
            return True
        except Exception:
            return False

    def remove_recursive(self, path: str) -> None:
        self.dbutils.fs.rm(path, recurse=True)

    def mtime(self, path: str) -> Optional[float]:
        try:
            info = self.dbutils.fs.ls(path)
            if len(info) == 1:
                return info[0].modificationTime / 1000.0
        except Exception:
            pass
        return None


class DatabricksDestination(Destination):
    """Databricks workspace destination: an abfss URI addressed through
    cluster credentials (reference:odbc2deltalake/destination/
    databricks.py:6-33 — account normalized to ``*.dfs.core.windows.net``,
    scheme overridable). Data plane needs no option mapping (the cluster
    is already authenticated); metadata plane goes through dbutils."""

    scheme = "abfss"

    def __init__(
        self,
        dbutils,
        container: str,
        path: str,
        account: str,
        scheme: str = "abfss",
    ):
        super().__init__(path.removeprefix("/"), None)
        if "." not in account:
            account = account + ".dfs.core.windows.net"
        self.account = account
        self.container = container
        self.dbutils = dbutils
        self.scheme = scheme

    def uri(self) -> str:
        return f"{self.scheme}://{self.container}@{self.account}/{self.path}"

    def storage_backend(self, allow_nonatomic: bool = False) -> StorageBackend:
        return DbutilsStorageBackend(self.dbutils, allow_nonatomic=allow_nonatomic)


def parse_destination(uri: str, storage_options: Optional[dict] = None) -> Destination:
    """Factory from a URI: ``abfss://c@acct.dfs.core.windows.net/p``,
    ``az://container/p``, ``s3://bucket/p`` / ``s3a://bucket/p``, else a
    plain path Destination."""
    if uri.startswith(("abfss://", "az://")):
        scheme, rest = uri.split("://", 1)
        loc, _, path = rest.partition("/")
        if "@" in loc:
            container, host = loc.split("@", 1)
            # keep the FULL host: non-public clouds carry their own suffix
            return AzureDestination(container, path, storage_options, account_name=host)
        return AzureDestination(loc, path, storage_options)
    if uri.startswith(("s3://", "s3a://")):
        rest = uri.split("://", 1)[1]
        bucket, _, path = rest.partition("/")
        return S3Destination(bucket, path, storage_options)
    return Destination(uri, storage_options)
