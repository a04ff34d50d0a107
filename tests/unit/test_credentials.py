"""Credentials-file discovery and auth-method selection (reference
util/credentials.py): given LOGPREP_CREDENTIALS_FILE, the getter and
the opensearch output attach the right Authorization header — asserted
via stub transports, no network."""

import base64
import json

import pytest

from logprep_spark.credentials import (
    AccessToken,
    BasicAuthCredentials,
    CredentialsError,
    CredentialsFactory,
    MTLSCredentials,
    OAuth2ClientFlowCredentials,
    OAuth2PasswordFlowCredentials,
    OAuth2TokenCredentials,
    match_credentials,
)


@pytest.fixture()
def creds_file(tmp_path, monkeypatch):
    def write(mapping: dict):
        path = tmp_path / "credentials.json"
        path.write_text(json.dumps(mapping))
        monkeypatch.setenv("LOGPREP_CREDENTIALS_FILE", str(path))
        return path

    return write


def basic_of(user, pw):
    return "Basic " + base64.b64encode(f"{user}:{pw}".encode()).decode()


def test_match_precedence_mirrors_reference():
    """token > mTLS > password-confidential > client > password > basic
    (reference _match_credentials :283)."""
    assert isinstance(match_credentials({"token": "t", "username": "u"}), OAuth2TokenCredentials)
    assert isinstance(
        match_credentials({"client_key": "k", "cert": "c", "username": "u"}), MTLSCredentials
    )
    pw_conf = match_credentials(
        {"endpoint": "e", "client_id": "i", "client_secret": "s",
         "username": "u", "password": "p"}
    )
    assert isinstance(pw_conf, OAuth2PasswordFlowCredentials) and pw_conf.client_id == "i"
    assert isinstance(
        match_credentials({"endpoint": "e", "client_id": "i", "client_secret": "s"}),
        OAuth2ClientFlowCredentials,
    )
    assert isinstance(
        match_credentials({"endpoint": "e", "username": "u", "password": "p"}),
        OAuth2PasswordFlowCredentials,
    )
    assert isinstance(
        match_credentials({"username": "u", "password": "p"}), BasicAuthCredentials
    )
    assert match_credentials({"unrelated": 1}) is None
    assert match_credentials(None) is None


def test_secret_files_resolved(tmp_path):
    (tmp_path / "pw").write_text("hunter2\n")
    creds = match_credentials(
        {"username": "u", "password": "inline", "password_file": str(tmp_path / "pw")}
    )
    # file variant overwrites inline (reference doc: password is
    # overwritten if password_file is given)
    assert creds.password == "hunter2"


def test_basic_header(creds_file):
    creds_file({"getter": {"https://rules.example": {"username": "u", "password": "p"}}})
    creds = CredentialsFactory.from_target("https://rules.example")
    assert creds.get_headers() == {"Authorization": basic_of("u", "p")}


def test_prefix_match_and_exact_priority(creds_file):
    creds_file({"getter": {
        "https://host": {"token": "broad"},
        "https://host/api": {"token": "narrow"},
        "https://host/api/v1/rules.yml": {"token": "exact"},
    }})
    assert "exact" in CredentialsFactory.from_target(
        "https://host/api/v1/rules.yml").get_headers()["Authorization"]
    assert "narrow" in CredentialsFactory.from_target(
        "https://host/api/v2").get_headers()["Authorization"]
    assert CredentialsFactory.from_target("https://other") is None


def test_oauth_client_flow_fetches_and_caches():
    calls = []

    def transport(url, data, headers):
        calls.append((url, dict(data), dict(headers)))
        return {"access_token": f"tok{len(calls)}", "expires_in": 3600}

    creds = OAuth2ClientFlowCredentials("https://idp/token", "cid", "cs", transport)
    assert creds.get_headers() == {"Authorization": "Bearer tok1"}
    assert creds.get_headers() == {"Authorization": "Bearer tok1"}  # cached
    assert len(calls) == 1
    url, data, headers = calls[0]
    assert data == {"grant_type": "client_credentials"}
    assert headers["Authorization"] == basic_of("cid", "cs")


def test_oauth_password_flow_refreshes_on_expiry():
    calls = []

    def transport(url, data, headers):
        calls.append(dict(data))
        return {"access_token": f"tok{len(calls)}", "expires_in": 60,
                "refresh_token": f"ref{len(calls)}"}

    creds = OAuth2PasswordFlowCredentials(
        "https://idp/token", "alice", "pw",
        client_id="cid", client_secret="cs", token_transport=transport,
    )
    assert creds.get_headers()["Authorization"] == "Bearer tok1"
    assert calls[0]["grant_type"] == "password" and calls[0]["username"] == "alice"
    # force expiry → next call uses the refresh grant, not the password
    creds._token.issued_at -= 120
    assert creds.get_headers()["Authorization"] == "Bearer tok2"
    assert calls[1] == {"grant_type": "refresh_token", "refresh_token": "ref1"}


def test_token_without_expiry_never_refreshes():
    tok = AccessToken(token="t")
    assert not tok.is_expired
    expiring = AccessToken(token="t", expires_in=10)
    expiring.issued_at -= 60
    assert expiring.is_expired


def test_token_endpoint_error_is_loud():
    creds = OAuth2ClientFlowCredentials(
        "https://idp/token", "i", "s", lambda u, d, h: {"error": "denied"}
    )
    with pytest.raises(CredentialsError, match="no access_token"):
        creds.get_headers()


def test_getter_attaches_credentials_file_header(creds_file):
    from logprep_spark.getter import GetterFactory

    creds_file({"getter": {"https://rules.example": {"token": "sekrit"}}})
    getter = GetterFactory.from_string("https://rules.example/rules.yml")
    assert getter._auth_headers() == {"Authorization": "Bearer sekrit"}


def test_getter_env_fallback(monkeypatch):
    from logprep_spark.getter import GetterFactory

    monkeypatch.delenv("LOGPREP_CREDENTIALS_FILE", raising=False)
    monkeypatch.setenv("LOGPREP_SPARK_HTTP_USER", "u")
    monkeypatch.setenv("LOGPREP_SPARK_HTTP_PASSWORD", "p")
    getter = GetterFactory.from_string("https://anywhere/x")
    assert getter._auth_headers() == {"Authorization": basic_of("u", "p")}


def test_opensearch_bulk_sends_auth_header(spark, creds_file, tmp_path):
    """The executor-side sender ships the driver-resolved Authorization
    header with every bulk body (transport runs in Python workers, so
    the stub records to disk, not memory)."""
    from logprep_spark.sources.outputs import OpensearchOutput

    creds_file({"getter": {"https://os.example:9200": {"username": "os", "password": "pw"}}})
    rec_dir = tmp_path / "rec"
    rec_dir.mkdir()
    rec = str(rec_dir)

    def transport(body, headers):
        import json as _json
        import os as _os
        import uuid

        with open(_os.path.join(rec, f"{uuid.uuid4().hex}.json"), "w") as fh:
            _json.dump({"body": body, "headers": headers}, fh)

    out = OpensearchOutput(
        "idx", transport=transport, hosts="https://os.example:9200"
    )
    out.write_batch(
        spark.createDataFrame([(1, "a")], "id long, msg string").coalesce(1), 0
    )
    recorded = [json.loads(p.read_text()) for p in rec_dir.iterdir()]
    assert recorded
    assert all(
        r["headers"]["Authorization"] == basic_of("os", "pw") for r in recorded
    )
    assert any('"_index": "idx"' in r["body"] for r in recorded)


def test_opensearch_single_arg_transport_still_works(spark, tmp_path):
    from logprep_spark.sources.outputs import OpensearchOutput

    rec_dir = tmp_path / "rec1"
    rec_dir.mkdir()
    rec = str(rec_dir)

    def transport(body):
        import os as _os
        import uuid

        with open(_os.path.join(rec, f"{uuid.uuid4().hex}.txt"), "w") as fh:
            fh.write(body)

    out = OpensearchOutput("idx", transport=transport)
    out.write_batch(spark.createDataFrame([(1,)], "id long").coalesce(1), 0)
    assert list(rec_dir.iterdir())


def test_endpoint_credentials_glob(creds_file):
    creds_file({"input": {"endpoints": {
        "/exact": {"username": "a", "password": "b"},
        "/wild*": {"token": "wtok"},
    }}})
    assert isinstance(CredentialsFactory.from_endpoint("/exact"), BasicAuthCredentials)
    assert isinstance(
        CredentialsFactory.from_endpoint("/wildcard/path"), OAuth2TokenCredentials
    )
    assert CredentialsFactory.from_endpoint("/nope") is None


def test_yaml_credentials_file(tmp_path, monkeypatch):
    path = tmp_path / "creds.yml"
    path.write_text(
        "getter:\n  \"https://y.example\":\n    username: yu\n    password: yp\n"
    )
    monkeypatch.setenv("LOGPREP_CREDENTIALS_FILE", str(path))
    creds = CredentialsFactory.from_target("https://y.example")
    assert creds.get_headers() == {"Authorization": basic_of("yu", "yp")}
