"""Destination option mapping: one user-facing storage_options dict in,
each consumer's exact dialect out (Spark/Hadoop data-plane keys, fsspec
metadata-plane kwargs) — the reference's convert_options surface
(reference:odbc2deltalake/destination/azure_utils.py:41-80) re-expressed
for a Spark engine. No network: the drivers stay import-gated; these
tests pin the mappings themselves."""

from __future__ import annotations

import pytest

from odbc2deltalake_spark.destinations import (
    AzureDestination,
    DatabricksDestination,
    DbutilsStorageBackend,
    Destination,
    S3Destination,
    parse_destination,
)
from odbc2deltalake_spark.tablestore import CommitConflictError


# ---------------------------------------------------------------- azure --


def test_azure_shared_key_maps_to_abfs_configs():
    d = AzureDestination(
        "data", "tables/orders",
        {"account_name": "acct1", "account_key": "sekrit=="},
    )
    host = "acct1.dfs.core.windows.net"
    assert d.uri() == f"abfss://data@{host}/tables/orders"
    so = d.spark_options()
    assert so[f"fs.azure.account.auth.type.{host}"] == "SharedKey"
    assert so[f"fs.azure.account.key.{host}"] == "sekrit=="
    fo = d.fsspec_options()
    assert fo["account_name"] == "acct1" and fo["account_key"] == "sekrit=="


def test_azure_sas_and_oauth_mappings():
    host = "a.dfs.core.windows.net"
    sas = AzureDestination("c", "p", {"account_name": "a", "sas_token": "sv=..."})
    so = sas.spark_options()
    assert so[f"fs.azure.account.auth.type.{host}"] == "SAS"
    assert so[f"fs.azure.sas.fixed.token.{host}"] == "sv=..."

    oauth = AzureDestination(
        "c", "p",
        {"account_name": "a", "client_id": "cid", "client_secret": "cs",
         "tenant_id": "tid"},
    )
    so = oauth.spark_options()
    assert so[f"fs.azure.account.auth.type.{host}"] == "OAuth"
    assert so[f"fs.azure.account.oauth2.client.id.{host}"] == "cid"
    assert "tid" in so[f"fs.azure.account.oauth2.client.endpoint.{host}"]


def test_azure_fsspec_flavor_rules():
    # emulator short-circuits to the well-known connection string
    emu = AzureDestination("c", "p", {"use_emulator": "1"})
    assert "devstoreaccount1" in emu.fsspec_options()["connection_string"]
    # account_name without explicit credential anchors anon=False
    # (fsspec's anon-by-default footgun, same rule as the reference)
    d = AzureDestination("c", "p", {"account_name": "a"})
    assert d.fsspec_options()["anon"] is False
    # explicit credential => no anon injection
    d2 = AzureDestination("c", "p", {"account_name": "a", "account_key": "k"})
    assert "anon" not in d2.fsspec_options()


# ------------------------------------------------------------------ s3 --


def test_s3_maps_to_bucket_scoped_s3a_configs():
    d = S3Destination(
        "corpus", "tables/docs",
        {"access_key_id": "AK", "secret_access_key": "SK",
         "session_token": "ST", "endpoint_url": "http://minio:9000",
         "region": "eu-west-1", "path_style": "true"},
    )
    assert d.uri() == "s3a://corpus/tables/docs"
    so = d.spark_options()
    ns = "fs.s3a.bucket.corpus"
    assert so[f"{ns}.access.key"] == "AK"
    assert so[f"{ns}.secret.key"] == "SK"
    assert so[f"{ns}.session.token"] == "ST"
    assert "TemporaryAWSCredentialsProvider" in so[f"{ns}.aws.credentials.provider"]
    assert so[f"{ns}.endpoint"] == "http://minio:9000"
    assert so[f"{ns}.endpoint.region"] == "eu-west-1"
    assert so[f"{ns}.path.style.access"] == "true"
    fo = d.fsspec_options()
    assert fo["key"] == "AK" and fo["secret"] == "SK" and fo["token"] == "ST"
    assert fo["client_kwargs"] == {
        "endpoint_url": "http://minio:9000", "region_name": "eu-west-1"
    }


def test_s3_anon():
    d = S3Destination("pub", "x", {"anon": "true"})
    assert "AnonymousAWSCredentialsProvider" in d.spark_options()[
        "fs.s3a.bucket.pub.aws.credentials.provider"
    ]
    assert d.fsspec_options()["anon"] is True


# ------------------------------------------------------------ factory --


def test_parse_destination_routes_schemes():
    a = parse_destination("abfss://c@acct.dfs.core.windows.net/t/x", {"account_key": "k"})
    assert isinstance(a, AzureDestination)
    assert a.container == "c" and a.host == "acct.dfs.core.windows.net"
    assert a.path == "t/x"
    # sovereign-cloud host suffixes survive the round trip (regression:
    # the account used to be truncated at the first dot and rebuilt
    # against the public-cloud suffix)
    gov = parse_destination(
        "abfss://data@acct.dfs.core.usgovcloudapi.net/tbl", {"account_key": "k"}
    )
    assert gov.host == "acct.dfs.core.usgovcloudapi.net"
    assert gov.uri() == "abfss://data@acct.dfs.core.usgovcloudapi.net/tbl"
    assert any("acct.dfs.core.usgovcloudapi.net" in k for k in gov.spark_options())
    assert not any("windows.net" in k for k in gov.spark_options())
    s = parse_destination("s3://b/t/x")
    assert isinstance(s, S3Destination) and s.bucket == "b"
    p = parse_destination("/tmp/local/table")
    assert type(p) is Destination and p.uri() == "/tmp/local/table"


def test_path_algebra_matches_reference_truediv():
    d = AzureDestination("c", "base", {"account_name": "a"})
    child = d / "orders" / "v1"
    assert child.uri().endswith("/base/orders/v1")
    assert child.container == "c"  # everything else carried over


# -------------------------------------------------------- databricks --


class _FakeFileInfo:
    def __init__(self, name, modificationTime=1_700_000_000_000):
        self.name = name
        self.modificationTime = modificationTime


class _FakeDbutilsFs:
    """In-memory dbutils.fs with the put/head/ls/rm surface the backend
    uses (put(overwrite=False) refuses an existing path, like dbfs)."""

    def __init__(self):
        self.files: dict[str, str] = {}

    def put(self, path, text, overwrite=False):
        if not overwrite and path in self.files:
            raise Exception(f"{path} already exists")
        self.files[path] = text

    def head(self, path, max_bytes=65536):
        return self.files[path][:max_bytes]

    def ls(self, path):
        if path in self.files:
            return [_FakeFileInfo(path.rsplit("/", 1)[-1])]
        pfx = path.rstrip("/") + "/"
        names = {f[len(pfx):].split("/")[0] for f in self.files if f.startswith(pfx)}
        if not names:
            raise Exception("file not found")
        return [_FakeFileInfo(n) for n in sorted(names)]

    def rm(self, path, recurse=False):
        pfx = path.rstrip("/") + "/"
        for f in list(self.files):
            if f == path or (recurse and f.startswith(pfx)):
                del self.files[f]

    def mkdirs(self, path):
        pass


class _FakeDbutils:
    def __init__(self):
        self.fs = _FakeDbutilsFs()


def test_databricks_destination_uri_and_backend():
    db = _FakeDbutils()
    d = DatabricksDestination(db, "cont", "/tables/t1", "myacct")
    assert d.uri() == "abfss://cont@myacct.dfs.core.windows.net/tables/t1"
    be = d.storage_backend(allow_nonatomic=True)
    assert isinstance(be, DbutilsStorageBackend)
    assert be.exclusive_is_native is False

    be.write_text_atomic("root/_commits/0000000001.json", '{"v":1}')
    assert be.read_text("root/_commits/0000000001.json") == '{"v":1}'
    assert be.list_dir("root/_commits") == ["0000000001.json"]
    # exclusive create: second write of the same commit must conflict
    be.write_text_exclusive("root/_commits/0000000002.json", "{}")
    with pytest.raises(CommitConflictError):
        be.write_text_exclusive("root/_commits/0000000002.json", "{}")
    be.remove_recursive("root")
    assert be.list_dir("root/_commits") == []


def test_databricks_backend_refuses_lockless_by_default():
    be = DbutilsStorageBackend(_FakeDbutils())
    with pytest.raises(CommitConflictError):
        be.write_text_exclusive("root/_commits/0000000001.json", "{}")
