"""Pseudonymizer — replace sensitive field parts with stable pseudonyms.

Reference: /root/reference/logprep/processor/pseudonymizer/processor.py
(``_pseudonymize_field`` :297-317: regex ``findall`` collects the
captured substrings — whole matches when the regex has no groups — and
each distinct captured value is replaced literally throughout the field,
leaving surrounding text intact; the (pseudonym, origin) pairs are
emitted as extra events for de-pseudonymization).

Spark realization, fully JVM-side (no Python row path):

- capture collection is ``regexp_extract_all`` (one call per group
  index, unioned via ``concat``),
- replacement is a fold: ``aggregate(values, field, (acc, v) ->
  replace(acc, v, '<pseudonym:' || hash(v) || '>'))`` — literal
  replace-all per distinct captured value, longest-first so a value
  that is a substring of another can't clobber it (the reference
  iterates a Python set — arbitrary order; longest-first is the
  deterministic refinement),
- the pseudonym is a keyed ``sha2`` by default (``mode="hash"``), or a
  reversible AES-ECB/PKCS ciphertext (``mode="encrypt"``, Spark's
  builtin ``aes_encrypt``), mirroring the reference's encrypter intent
  (/root/reference/logprep/util/pseudo/encrypter.py:17 — hybrid
  AES+dual-RSA; the dual-keyholder split is out of scope in-sandbox,
  the reversibility contract is honored via :func:`depseudonymize`).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


def pseudonym_for(col, secret: str = "", mode: str = "hash") -> Column:
    """Pseudonym expression for a captured value.

    ``hash``: keyed sha2-256 (one-way, the oracle-checkable default).
    ``encrypt``: base64(aes_encrypt(value, key)) — deterministic
    (ECB+PKCS so identical origins yield identical pseudonyms, which
    the dedup/caching semantics of the reference rely on) and
    reversible with :func:`depseudonym_for` given the same key.
    """
    col = col.cast("string")
    if mode == "encrypt":
        return _b64(F.aes_encrypt(col, F.lit(_aes_key(secret)), F.lit("ECB"), F.lit("PKCS")))
    if mode == "hybrid":
        # secret carries both keys joined by a \\x1f separator at this
        # level; Pseudonymizer passes them pre-joined
        analyst, _, depseudo = secret.partition("\x1f")
        return hybrid_encrypt(col, analyst, depseudo)
    return F.sha2(F.concat(F.lit(secret), col), 256)


def depseudonym_for(col, secret: str = "") -> Column:
    """Invert an ``encrypt``-mode pseudonym back to the origin value."""
    return F.aes_decrypt(
        F.unbase64(col.cast("string")), F.lit(_aes_key(secret)), F.lit("ECB"), F.lit("PKCS")
    ).cast("string")


def _aes_key(secret: str) -> str:
    """Derive a 32-byte AES-256 key from the configured secret (full
    128-bit-entropy hex prefix of sha256; 16 hex chars would be only
    64 bits of key material)."""
    import hashlib

    return hashlib.sha256(secret.encode()).hexdigest()[:32]


def _b64(col: Column) -> Column:
    """base64 without MIME line-chunking: Spark's ``base64`` can insert
    CR/LF every 76 chars (legacy chunked encoder), which would split a
    pseudonym token; ``unbase64`` accepts the stripped form."""
    return F.regexp_replace(F.base64(col), r"[\r\n]", "")


def _key_bytes(secret: str) -> bytes:
    """Full 32-byte AES-256 key material from a secret."""
    import hashlib

    return hashlib.sha256(secret.encode()).digest()


def hybrid_encrypt(col: Column, analyst_secret: str, depseudo_secret: str) -> Column:
    """Dual-control hybrid pseudonym (reference
    util/pseudo/encrypter.py:42-96, DualPKCS1HybridGCMEncrypter): the
    value is AES-GCM-encrypted under a fresh per-row session key; the
    session key is wrapped under the DEPSEUDO key, and that wrap is
    wrapped again under the ANALYST key — recovering the origin
    requires BOTH parties, neither alone can depseudonymize.

    Deviation from the reference, stated plainly: the two outer wraps
    use symmetric AES-GCM (Spark builtins, JVM-side) rather than
    RSA/PKCS#1-OAEP public keys — no RSA primitive ships in-sandbox.
    The dual-keyholder structure and token layout (wrapped-wrapped
    session key + ciphertext, GCM nonces embedded) are preserved; a
    production deployment swaps the two wrap calls for RSA public-key
    encryption without touching the plan shape.

    Token format: base64(wrap2) '.' base64(ciphertext).

    INVARIANT: the nondeterministic per-row session key must evaluate
    to the SAME bytes in the key-wrap and the ciphertext expression —
    if the two occurrences ever re-seeded independently, every token
    would be undecryptable. Rather than relying on Column-instance
    reuse (observed-correct but not guaranteed semantics), the key is
    bound ONCE as a lambda variable: ``transform(array(key), sk ->
    token(sk))`` evaluates the uuid exactly once and both consumers
    read the bound ``sk``.
    """
    value = col.cast("string")
    # fresh 32-byte session key per row (uuid -> sha2 -> raw bytes)
    session_key = F.unhex(F.sha2(F.concat(F.uuid(), value), 256))

    def _token(sk: Column) -> Column:
        wrapped = F.aes_encrypt(sk, F.lit(_key_bytes(depseudo_secret)), F.lit("GCM"))
        wrapped2 = F.aes_encrypt(wrapped, F.lit(_key_bytes(analyst_secret)), F.lit("GCM"))
        ciphertext = F.aes_encrypt(value.cast("binary"), sk, F.lit("GCM"))
        return F.concat(_b64(wrapped2), F.lit("."), _b64(ciphertext))

    return F.element_at(F.transform(F.array(session_key), _token), 1)


def hybrid_decrypt(col: Column, analyst_secret: str, depseudo_secret: str) -> Column:
    """Invert :func:`hybrid_encrypt` given BOTH keys. Wrong or missing
    key material yields NULL (``try_aes_decrypt`` — GCM auth fails),
    never a wrong plaintext."""
    col = col.cast("string")
    wrap2 = F.unbase64(F.split_part(col, F.lit("."), F.lit(1)))
    ciphertext = F.unbase64(F.split_part(col, F.lit("."), F.lit(2)))
    wrapped = F.try_aes_decrypt(wrap2, F.lit(_key_bytes(analyst_secret)), F.lit("GCM"))
    session_key = F.try_aes_decrypt(wrapped, F.lit(_key_bytes(depseudo_secret)), F.lit("GCM"))
    return F.try_aes_decrypt(ciphertext, session_key, F.lit("GCM")).cast("string")


def _count_groups(regex: str) -> int:
    try:
        return re.compile(regex).groups
    except re.error:
        # Java-only syntax Python can't compile: count unescaped '('
        # not followed by '?' and not inside a character class
        n = 0
        i, in_class = 0, False
        while i < len(regex):
            c = regex[i]
            if c == "\\":
                i += 2
                continue
            if in_class:
                in_class = c != "]"
            elif c == "[":
                in_class = True
            elif c == "(" and (i + 1 >= len(regex) or regex[i + 1] != "?"):
                n += 1
            i += 1
        return n


def _captured_values(src: Column, regex: str) -> Column:
    """Distinct captured substrings, longest-first (see module doc).
    Group 0 (whole match) when the regex has no capture groups."""
    n_groups = _count_groups(regex)
    if n_groups == 0:
        arr = F.regexp_extract_all(src, F.lit(regex), F.lit(0))
    else:
        arr = F.concat(
            *[F.regexp_extract_all(src, F.lit(regex), F.lit(g)) for g in range(1, n_groups + 1)]
        )
    arr = F.array_distinct(F.filter(arr, lambda v: v != ""))
    # sort by (-length, value): longest-first, deterministic
    keyed = F.array_sort(F.transform(arr, lambda v: F.struct((-F.length(v)).alias("nl"), v.alias("v"))))
    return F.transform(keyed, lambda s: s.getField("v"))


#: URLs inside a text field (scheme optional, like the reference's
#: extract_urls); conservative charset so trailing punctuation stays out
URL_RE = r"(?:https?://)[A-Za-z0-9_.:@-]+\.[A-Za-z]{2,}(?::\d+)?(?:/[^\s\"'<>]*)?"


def pseudonymize_url(url: Column, secret: str = "", mode: str = "hash") -> Column:
    """Structural URL pseudonymization (reference ``_pseudonymize_url``
    processor.py:333-365): scheme, registered domain (last two hostname
    labels) and port stay READABLE; the subdomain, fragment, userinfo,
    path and query values are each pseudonymized in place.

    The URL is REBUILT positionally from ``parse_url`` components
    (scheme://[user@]host[:port]/path?query#frag) — never substring
    replace over the whole string, so a path label that also occurs in
    the registered domain (https://example.com/example) or inside an
    already-inserted pseudonym token can't corrupt the result. All
    parsing is Spark's builtin ``parse_url`` — no Python row path."""
    url = url.cast("string")
    had_scheme = url.rlike("^https?://")
    base = F.when(had_scheme, url).otherwise(F.concat(F.lit("http://"), url))

    def wrap(v: Column) -> Column:
        return F.concat(F.lit("<pseudonym:"), pseudonym_for(v, secret, mode), F.lit(">"))

    proto = F.parse_url(base, F.lit("PROTOCOL"))
    userinfo = F.coalesce(F.parse_url(base, F.lit("USERINFO")), F.lit(""))
    host = F.coalesce(F.parse_url(base, F.lit("HOST")), F.lit(""))
    authority = F.coalesce(F.parse_url(base, F.lit("AUTHORITY")), F.lit(""))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    path = F.coalesce(F.parse_url(base, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(base, F.lit("QUERY")), F.lit(""))
    frag = F.coalesce(F.parse_url(base, F.lit("REF")), F.lit(""))

    labels = F.split(host, r"\.")
    n = F.size(labels)
    sub = F.array_join(F.slice(labels, 1, n - 2), ".")
    domain = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    host_out = F.when(n > 2, F.concat(wrap(sub), F.lit("."), domain)).otherwise(host)

    bare_path = F.substring(path, 2, 1 << 20)
    path_out = F.when(
        F.length(path) > 1, F.concat(F.lit("/"), wrap(bare_path))
    ).otherwise(path)

    masked_query = F.array_join(
        F.transform(
            F.split(query, "&"),
            lambda kv: F.when(
                kv.contains("="),
                F.concat(
                    F.split_part(kv, F.lit("="), F.lit(1)),
                    F.lit("="),
                    wrap(F.split_part(kv, F.lit("="), F.lit(2))),
                ),
            ).otherwise(wrap(kv)),
        ),
        "&",
    )

    return F.concat(
        F.when(had_scheme, F.concat(proto, F.lit("://"))).otherwise(F.lit("")),
        F.when(userinfo != "", F.concat(wrap(userinfo), F.lit("@"))).otherwise(F.lit("")),
        host_out,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path_out,
        F.when(query != "", F.concat(F.lit("?"), masked_query)).otherwise(F.lit("")),
        F.when(frag != "", F.concat(F.lit("#"), wrap(frag))).otherwise(F.lit("")),
    )


class Pseudonymizer(Processor):
    rule_type = "pseudonymizer"

    def __init__(
        self,
        rules=None,
        secret: str = "",
        mode: str = "hash",
        depseudo_secret: str = "",
        **kw,
    ):
        super().__init__(rules, **kw)
        # hybrid mode folds both key secrets into the secret channel so
        # every pseudonym_for call site stays one-argument
        self.secret = f"{secret}\x1f{depseudo_secret}" if mode == "hybrid" else secret
        self.mode = mode

    def _wrapped(self, value: Column) -> Column:
        return F.concat(
            F.lit("<pseudonym:"), pseudonym_for(value, self.secret, self.mode), F.lit(">")
        )

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        url_fields = set(cfg.get("url_fields", []) or [])
        for path, regex in cfg["mapping"].items():
            src = fld.get_field(df, path)
            if src is None:
                continue
            src = src.cast("string")
            if path in url_fields:
                # reference: URLs in url_fields are pseudonymized
                # STRUCTURALLY (subdomain/path/query/... masked, domain
                # readable) instead of hashed whole — but only when the
                # rule's mapping regex matched the field value
                # (reference _pseudonymize_field gates on the match).
                urls = F.array_distinct(F.regexp_extract_all(src, F.lit(URL_RE), F.lit(0)))
                replaced = F.when(
                    src.rlike(regex),
                    F.aggregate(
                        urls,
                        src,
                        lambda acc, u: F.replace(
                            acc, u, pseudonymize_url(u, self.secret, self.mode)
                        ),
                    ),
                ).otherwise(src)
            else:
                # Two-phase fold: value -> NUL-delimited index sentinel,
                # then sentinel -> pseudonym. A later (shorter) captured
                # value can occur as a substring of an earlier
                # pseudonym's base64 ciphertext; sentinels keep inserted
                # tokens out of the replace search space entirely.
                tagged = F.transform(
                    _captured_values(src, regex),
                    lambda v, i: F.struct(v.alias("v"), i.cast("string").alias("i")),
                )
                sentinel = lambda s: F.concat(  # noqa: E731
                    F.lit("\x00"), s.getField("i"), F.lit("\x00")
                )
                step1 = F.aggregate(
                    tagged, src, lambda acc, s: F.replace(acc, s.getField("v"), sentinel(s))
                )
                replaced = F.aggregate(
                    tagged,
                    step1,
                    lambda acc, s: F.replace(
                        acc, sentinel(s), self._wrapped(s.getField("v"))
                    ),
                )
            value = F.when(cond, replaced).otherwise(src)
            df = fld.set_field(df, path, value)
        return df

    def depseudonymize(self, df: DataFrame, path: str) -> DataFrame:
        """Reverse ``mode="encrypt"`` pseudonyms in a field (the
        reference's depseudonymizer workflow, keyholder side): every
        ``<pseudonym:...>`` wrapper is replaced by its decrypted
        origin. One fold over the extracted wrappers — JVM-side."""
        src = fld.get_field(df, path).cast("string")
        wrappers = F.array_distinct(
            F.regexp_extract_all(src, F.lit(r"<pseudonym:([A-Za-z0-9+/=.]+)>"), F.lit(1))
        )
        if self.mode == "hybrid":
            analyst, _, depseudo = self.secret.partition("\x1f")
            decrypt = lambda tok: hybrid_decrypt(tok, analyst, depseudo)  # noqa: E731
        else:
            decrypt = lambda tok: depseudonym_for(tok, self.secret)  # noqa: E731
        restored = F.aggregate(
            wrappers,
            src,
            lambda acc, tok: F.replace(
                acc,
                F.concat(F.lit("<pseudonym:"), tok, F.lit(">")),
                decrypt(tok),
            ),
        )
        return fld.set_field(df, path, restored)

    def pseudonyms(self, df: DataFrame) -> DataFrame:
        """Side-output DataFrame of (pseudonym, origin) pairs — the
        reference's extra 'pseudonyms' output topic. Origins are the
        CAPTURED substrings (reference parity), not whole fields."""
        outs = []
        for rule in self.rules:
            cond = self.condition(df, rule)
            for path, regex in rule.config["mapping"].items():
                src = fld.get_field(df, path)
                if src is None:
                    continue
                src = src.cast("string")
                outs.append(
                    df.filter(cond)
                    .select(F.explode(_captured_values(src, regex)).alias("origin"))
                    .select(
                        pseudonym_for(F.col("origin"), self.secret, self.mode).alias(
                            "pseudonym"
                        ),
                        "origin",
                    )
                )
        if not outs:
            return df.sparkSession.createDataFrame([], "pseudonym string, origin string")
        out = outs[0]
        for other in outs[1:]:
            out = out.unionByName(other)
        return out.dropDuplicates(["pseudonym"])
