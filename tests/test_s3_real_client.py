"""Conditional real-boto3 exercise of the S3 adapter (VERDICT r8 #8).

The sandbox has no boto3; these tests SKIP cleanly there and light up the
moment the environment provides the library — the same conditional-import
boundary the PGM/PIL codec tests use. When boto3 IS present, botocore's
``Stubber`` drives :class:`S3ObjectStore` through real botocore
request-serialization and response-parsing (the layer the in-repo
``FakeBoto3S3Client`` can only imitate), with no network or credentials.
"""

from __future__ import annotations

import io

import pytest

boto3 = pytest.importorskip("boto3")
from botocore.stub import Stubber  # noqa: E402

from haf_plug_play_spark.runner.fs import S3ObjectStore  # noqa: E402


@pytest.fixture()
def stubbed():
    client = boto3.client(
        "s3",
        region_name="us-east-1",
        aws_access_key_id="stub",
        aws_secret_access_key="stub",
    )
    stubber = Stubber(client)
    store = S3ObjectStore(client, "bucket")
    with stubber:
        yield store, stubber
    stubber.assert_no_pending_responses()


def test_head_parses_real_botocore_response(stubbed):
    store, stubber = stubbed
    stubber.add_response(
        "head_object",
        {"ETag": '"abc123"', "ContentLength": 7},
        {"Bucket": "bucket", "Key": "state/pointer"},
    )
    assert store.head("/state/pointer") == {"etag": "abc123", "size": 7}


def test_head_404_maps_to_none(stubbed):
    store, stubber = stubbed
    stubber.add_client_error(
        "head_object",
        service_error_code="404",
        http_status_code=404,
        expected_params={"Bucket": "bucket", "Key": "missing"},
    )
    assert store.head("/missing") is None


def test_get_roundtrips_body_and_etag(stubbed):
    store, stubber = stubbed
    stubber.add_response(
        "get_object",
        {"Body": io.BytesIO(b"payload"), "ETag": '"e1"'},
        {"Bucket": "bucket", "Key": "k"},
    )
    assert store.get("/k") == (b"payload", "e1")


def test_conditional_put_412_maps_to_precondition_failed(stubbed):
    from haf_plug_play_spark.runner.fs import PreconditionFailed

    store, stubber = stubbed
    stubber.add_client_error(
        "put_object",
        service_error_code="PreconditionFailed",
        http_status_code=412,
    )
    with pytest.raises(PreconditionFailed):
        store.put("/k", b"new", if_match="stale-etag")


def test_from_boto3_constructs_client():
    store = S3ObjectStore.from_boto3(
        "bucket",
        region_name="us-east-1",
        aws_access_key_id="stub",
        aws_secret_access_key="stub",
    )
    assert store._b == "bucket"
