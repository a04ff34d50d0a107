"""Credentials for HTTP getters and network outputs.

Reference parity: /root/reference/logprep/util/credentials.py —
credentials-file discovery via ``LOGPREP_CREDENTIALS_FILE`` (:128),
``CredentialsFactory.from_target`` (:138), the method-selection rule
table (:283, mirrored in :func:`match_credentials` with the same
precedence: token > mTLS > OAuth2 password-confidential > OAuth2
client-credentials > OAuth2 password > basic), ``AccessToken`` expiry
(:405) and OAuth2 refresh-token renewal (:553).

Spark-side realization: a credential resolves to request *headers*
(plus TLS file paths for mTLS) that the caller's injectable transport
attaches. Token-endpoint calls go through an injectable
``token_transport(url, data, headers) -> dict`` so tests run hermetic;
the default transport is the same env-gated urllib POST discipline as
:mod:`logprep_spark.getter` (no network unless
``LOGPREP_SPARK_ALLOW_HTTP=1``).
"""

from __future__ import annotations

import base64
import json
import os
import time
from dataclasses import dataclass, field

ENV_CREDENTIALS_FILE = "LOGPREP_CREDENTIALS_FILE"


class CredentialsError(ValueError):
    """Bad credentials file content or a failed token-endpoint call."""


class CredentialsEnvNotFoundError(CredentialsError):
    """A *_file secret path in the credentials file can't be read."""


def _default_token_transport(url: str, data: dict, headers: dict) -> dict:
    if os.environ.get("LOGPREP_SPARK_ALLOW_HTTP") != "1":
        raise CredentialsError(
            f"token endpoint {url} is disabled; set LOGPREP_SPARK_ALLOW_HTTP=1 "
            "to allow network access"
        )
    from urllib.parse import urlencode
    from urllib.request import Request, urlopen

    req = Request(
        url,
        data=urlencode(data).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded", **headers},
    )
    with urlopen(req, timeout=30) as resp:  # noqa: S310 - gated above
        return json.loads(resp.read())


@dataclass
class AccessToken:
    """Bearer token with expiry bookkeeping (reference :405-437)."""

    token: str
    expires_in: float | None = None
    refresh_token: str | None = None
    clock: object = time.monotonic  # injectable for tests
    issued_at: float = field(init=False)

    def __post_init__(self):
        self.issued_at = self.clock()

    @property
    def is_expired(self) -> bool:
        if self.expires_in is None:
            return False
        return self.clock() - self.issued_at > self.expires_in


class Credentials:
    """Base: subclasses implement ``get_headers()``; mTLS adds
    ``tls_kwargs``."""

    def get_headers(self) -> dict[str, str]:
        return {}

    @property
    def tls_kwargs(self) -> dict[str, str]:
        return {}


class BasicAuthCredentials(Credentials):
    def __init__(self, username: str, password: str):
        self.username, self.password = username, password

    def get_headers(self) -> dict[str, str]:
        raw = f"{self.username}:{self.password}".encode()
        return {"Authorization": f"Basic {base64.b64encode(raw).decode()}"}


class OAuth2TokenCredentials(Credentials):
    """A directly-supplied token — never refreshed (reference :531)."""

    def __init__(self, token: str):
        self.token = token

    def get_headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.token.strip()}"}


class _OAuth2FlowCredentials(Credentials):
    """Shared token-endpoint machinery for the two OAuth2 grant flows."""

    def __init__(self, endpoint: str, token_transport=None):
        self.endpoint = endpoint
        self.token_transport = token_transport or _default_token_transport
        self._token: AccessToken | None = None

    def _request_token(self, payload: dict, headers: dict | None = None) -> AccessToken:
        response = self.token_transport(self.endpoint, payload, headers or {})
        if "access_token" not in response:
            raise CredentialsError(
                f"token endpoint {self.endpoint} returned no access_token: "
                f"{sorted(response)}"
            )
        return AccessToken(
            token=response["access_token"],
            expires_in=response.get("expires_in"),
            refresh_token=response.get("refresh_token"),
        )

    def get_headers(self) -> dict[str, str]:
        if self._token is None or self._token.is_expired:
            self._token = self._fetch_token()
        return {"Authorization": f"Bearer {self._token.token}"}

    def _fetch_token(self) -> AccessToken:  # pragma: no cover - abstract
        raise NotImplementedError


class OAuth2PasswordFlowCredentials(_OAuth2FlowCredentials):
    """Resource-owner password grant; an expired token renews via its
    refresh_token when one was issued (reference :553-642)."""

    def __init__(
        self,
        endpoint: str,
        username: str,
        password: str,
        client_id: str | None = None,
        client_secret: str | None = None,
        token_transport=None,
    ):
        super().__init__(endpoint, token_transport)
        self.username, self.password = username, password
        self.client_id, self.client_secret = client_id, client_secret

    def _client_headers(self) -> dict[str, str]:
        if self.client_id and self.client_secret:
            raw = f"{self.client_id}:{self.client_secret}".encode()
            return {"Authorization": f"Basic {base64.b64encode(raw).decode()}"}
        return {}

    def _fetch_token(self) -> AccessToken:
        if self._token is not None and self._token.refresh_token:
            payload = {
                "grant_type": "refresh_token",
                "refresh_token": self._token.refresh_token,
            }
        else:
            payload = {
                "grant_type": "password",
                "username": self.username,
                "password": self.password,
            }
        return self._request_token(payload, self._client_headers())


class OAuth2ClientFlowCredentials(_OAuth2FlowCredentials):
    """Client-credentials grant (reference :644-718)."""

    def __init__(self, endpoint: str, client_id: str, client_secret: str, token_transport=None):
        super().__init__(endpoint, token_transport)
        self.client_id, self.client_secret = client_id, client_secret

    def _fetch_token(self) -> AccessToken:
        raw = f"{self.client_id}:{self.client_secret}".encode()
        return self._request_token(
            {"grant_type": "client_credentials"},
            {"Authorization": f"Basic {base64.b64encode(raw).decode()}"},
        )


class MTLSCredentials(Credentials):
    """Certificate paths for the transport layer (reference :720)."""

    def __init__(self, cert: str, client_key: str, ca_cert: str | None = None):
        self.cert, self.client_key, self.ca_cert = cert, client_key, ca_cert

    @property
    def tls_kwargs(self) -> dict[str, str]:
        out = {"certfile": self.cert, "keyfile": self.client_key}
        if self.ca_cert:
            out["ca_certs"] = self.ca_cert
        return out


def _resolve_secret_files(mapping: dict) -> dict:
    """``<key>_file`` entries are read from disk into ``<key>``
    (reference _resolve_secret_content :237); inline values win only
    when no file variant exists — the reference overwrites inline
    ``password`` with ``password_file`` content."""
    out = dict(mapping)
    for key in [k for k in mapping if k.endswith("_file")]:
        path = mapping[key]
        try:
            with open(path, encoding="utf8") as fh:
                out[key[: -len("_file")]] = fh.read().strip()
        except OSError as err:
            raise CredentialsEnvNotFoundError(
                f"cannot read secret file {path!r} for {key!r}: {err}"
            ) from err
        del out[key]
    return out


def match_credentials(mapping: dict | None, token_transport=None) -> Credentials | None:
    """The reference's method-selection rule table (:283-399), applied
    AFTER *_file resolution. Extra keys never fail — the most specific
    matching method wins, like the reference's ordered match cases."""
    if not mapping:
        return None
    m = _resolve_secret_files(mapping)
    flow_kw = {"token_transport": token_transport} if token_transport else {}
    if "token" in m:
        return OAuth2TokenCredentials(m["token"])
    if "client_key" in m and "cert" in m:
        return MTLSCredentials(m["cert"], m["client_key"], m.get("ca_cert"))
    if "endpoint" in m and "username" in m and "password" in m:
        return OAuth2PasswordFlowCredentials(
            m["endpoint"],
            m["username"],
            m["password"],
            client_id=m.get("client_id"),
            client_secret=m.get("client_secret"),
            **flow_kw,
        )
    if "endpoint" in m and "client_id" in m and "client_secret" in m:
        return OAuth2ClientFlowCredentials(
            m["endpoint"], m["client_id"], m["client_secret"], **flow_kw
        )
    if "username" in m and "password" in m:
        return BasicAuthCredentials(m["username"], m["password"])
    return None


class CredentialsFactory:
    """Resolve the credentials for a target URL or input endpoint from
    the file named by ``LOGPREP_CREDENTIALS_FILE`` (yaml or json)."""

    token_transport = None  # test hook: injected into OAuth2 flows

    @classmethod
    def _file_content(cls) -> dict:
        path = os.environ.get(ENV_CREDENTIALS_FILE)
        if not path:
            return {}
        try:
            with open(path, encoding="utf8") as fh:
                raw = fh.read()
        except OSError as err:
            raise CredentialsError(f"cannot read credentials file {path!r}: {err}") from err
        try:
            if path.endswith(".json"):
                return json.loads(raw)
            import yaml

            return yaml.safe_load(raw) or {}
        except Exception as err:
            raise CredentialsError(f"cannot parse credentials file {path!r}: {err}") from err

    @classmethod
    def from_target(cls, target_url: str) -> Credentials | None:
        """Credentials for an outbound url: exact match in the
        ``getter`` section first, then the longest matching prefix
        (the reference matches the raw url key)."""
        getters = cls._file_content().get("getter") or {}
        if target_url in getters:
            return match_credentials(getters[target_url], cls.token_transport)
        best = None
        for key in getters:
            if target_url.startswith(key) and (best is None or len(key) > len(best)):
                best = key
        return match_credentials(getters.get(best), cls.token_transport) if best else None

    @classmethod
    def from_endpoint(cls, endpoint: str) -> Credentials | None:
        """Credentials an http *input* endpoint requires of its clients
        (reference :166): exact endpoint path first, then fnmatch-style
        ``*`` patterns (reference uses ``/second*`` globs)."""
        from fnmatch import fnmatch

        endpoints = (cls._file_content().get("input") or {}).get("endpoints") or {}
        if endpoint in endpoints:
            return match_credentials(endpoints[endpoint], cls.token_transport)
        for pattern, mapping in endpoints.items():
            if fnmatch(endpoint, pattern):
                return match_credentials(mapping, cls.token_transport)
        return None
