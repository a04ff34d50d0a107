"""Content getters: uniform access to rule/config sources by URI.

Reference parity: /root/reference/logprep/util/getter.py (GetterFactory
``<protocol>://<target>`` dissection, env-var expansion in targets,
file default, http(s) with credentials) and
/root/reference/logprep/util/credentials.py (Authorization from
environment). The http transport is stdlib ``urllib`` and — like the
other network connectors in this repo — environment-gated: without
``LOGPREP_SPARK_ALLOW_HTTP=1`` a descriptive error is raised instead of
a network call, keeping tests hermetic.
"""

from __future__ import annotations

import os
import re
from string import Template


class GetterNotFoundError(ValueError):
    """Raised when no getter exists for a protocol."""


_URI_RE = re.compile(r"^(?P<protocol>[a-z0-9]+)://(?P<target>.+)", re.IGNORECASE)


class FileGetter:
    """Reads local files; the default when no protocol is given."""

    def __init__(self, target: str):
        self.protocol = "file"
        self.target = target

    def get_raw(self) -> bytes:
        with open(self.target, "rb") as fh:
            return fh.read()

    def get(self) -> str:
        return self.get_raw().decode("utf8")

    def get_yaml(self):
        import yaml

        docs = [d for d in yaml.safe_load_all(self.get()) if d is not None]
        return docs[0] if len(docs) == 1 else docs

    def get_json(self):
        import json

        return json.loads(self.get())

    def get_jsonl(self) -> list:
        import json

        return [json.loads(line) for line in self.get().splitlines() if line.strip()]


class HttpGetter(FileGetter):
    """Fetches rule/config content over http(s) with optional basic
    auth / bearer token from the environment (reference credentials.py
    semantics: secrets never live in the config file itself).

    Gated: refuses to touch the network unless
    ``LOGPREP_SPARK_ALLOW_HTTP=1`` — the sandbox has no egress, and a
    config pointing at an unreachable host should fail loudly at load,
    not mid-pipeline.
    """

    def __init__(self, target: str, protocol: str = "https"):
        self.protocol = protocol
        self.target = target

    @property
    def url(self) -> str:
        return f"{self.protocol}://{self.target}"

    def _auth_headers(self) -> dict:
        """Authorization for this url: the ``LOGPREP_CREDENTIALS_FILE``
        mapping wins (reference credentials.py:138 from_target — basic,
        token, OAuth2 flows with expiry refresh); the legacy env-var
        pair/token is the fallback."""
        from logprep_spark.credentials import CredentialsFactory

        creds = CredentialsFactory.from_target(self.url)
        if creds is not None:
            return creds.get_headers()
        user = os.environ.get("LOGPREP_SPARK_HTTP_USER")
        password = os.environ.get("LOGPREP_SPARK_HTTP_PASSWORD")
        token = os.environ.get("LOGPREP_SPARK_HTTP_TOKEN")
        if token:
            return {"Authorization": f"Bearer {token}"}
        if user and password:
            import base64

            basic = base64.b64encode(f"{user}:{password}".encode()).decode()
            return {"Authorization": f"Basic {basic}"}
        return {}

    def get_raw(self) -> bytes:
        if os.environ.get("LOGPREP_SPARK_ALLOW_HTTP") != "1":
            raise GetterNotFoundError(
                f"http getter for {self.url} is disabled; "
                "set LOGPREP_SPARK_ALLOW_HTTP=1 to allow network access"
            )
        from urllib.request import Request, urlopen

        req = Request(self.url, headers=self._auth_headers())
        with urlopen(req, timeout=30) as resp:  # noqa: S310 - gated above
            return resp.read()


class GetterFactory:
    """``from_string("<protocol>://<target>")`` — file is the default
    protocol; ``$VAR``/``${VAR}`` in targets expand from the
    environment (reference getter.py:60-86)."""

    @classmethod
    def from_string(cls, getter_string: str):
        match = _URI_RE.match(getter_string)
        if match:
            protocol = match.group("protocol").lower()
            target = match.group("target")
        else:
            protocol, target = "file", getter_string
        target = Template(target).safe_substitute(os.environ)
        if protocol == "file":
            return FileGetter(target)
        if protocol in ("http", "https"):
            return HttpGetter(target, protocol)
        raise GetterNotFoundError(f"no getter for protocol {protocol!r}")
