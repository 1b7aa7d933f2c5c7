"""Server-side SCRAM-SHA-256 authentication (RFC 5802 / RFC 7677).

Beyond-reference surface: the reference server supports no SASL at all
(it stubs GSS in ``protocol.scala:703-729`` and otherwise trusts), but
real PostgreSQL deployments default to ``scram-sha-256`` and hardened
clients / poolers refuse cleartext — so this is the first thing such a
client hits.  Pure stdlib: ``hashlib.pbkdf2_hmac`` + ``hmac``.

Wire shape (PG flavor of RFC 5802):

1. server → AuthenticationSASL carrying the mechanism list
   (``SCRAM-SHA-256``; on TLS connections also ``SCRAM-SHA-256-PLUS``
   with RFC 5929 tls-server-end-point channel binding — libpq sends
   ``channel_binding=prefer`` by default over SSL and picks -PLUS)
2. client → SASLInitialResponse: ``n,,n=<user>,r=<client-nonce>``
3. server → AuthenticationSASLContinue:
   ``r=<client+server nonce>,s=<b64 salt>,i=<iterations>``
4. client → SASLResponse: ``c=biws,r=<nonce>,p=<b64 ClientProof>``
5. server verifies the proof and answers AuthenticationSASLFinal
   ``v=<b64 ServerSignature>`` then AuthenticationOk — or fails 28P01.

The server derives the verifier from the cleartext password provided by
the embedder's ``password_lookup`` callback at connection time (PG
stores the salted verifier in pg_authid instead; deriving per-exchange
keeps the embedder API a plain password source).  Password
normalization: UTF-8 bytes verbatim — PG applies SASLprep but falls
back to the raw string when normalization fails, and the raw form is
the interoperable subset for ASCII passwords.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import secrets

MECHANISM = "SCRAM-SHA-256"
MECHANISM_PLUS = "SCRAM-SHA-256-PLUS"

#: PG's default scram iteration count (scram_iterations GUC default)
DEFAULT_ITERATIONS = 4096

#: the only channel-binding type PG implements (RFC 5929 §4)
CHANNEL_BINDING_TYPE = "tls-server-end-point"


def tls_server_end_point(cert_pem: bytes) -> bytes:
    """RFC 5929 tls-server-end-point binding data: hash of the server
    certificate (DER) using the certificate's signature hash, with
    MD5/SHA-1 upgraded to SHA-256 per the RFC."""
    import hashlib as _hashlib

    from cryptography import x509
    from cryptography.hazmat.primitives.serialization import Encoding

    cert = x509.load_pem_x509_certificate(cert_pem)
    algo = cert.signature_hash_algorithm
    name = algo.name if algo is not None else "sha256"
    if name in ("md5", "sha1"):
        name = "sha256"
    return _hashlib.new(name, cert.public_bytes(Encoding.DER)).digest()


class ScramError(ValueError):
    """Malformed or failed SCRAM exchange. ``sqlstate`` distinguishes a
    protocol violation (28000) from a bad proof (28P01)."""

    def __init__(self, message: str, sqlstate: str = "28000"):
        super().__init__(message)
        self.sqlstate = sqlstate


def _hmac(key: bytes, msg: bytes) -> bytes:
    return hmac.new(key, msg, hashlib.sha256).digest()


def _attrs(msg: str, what: str) -> dict[str, str]:
    """Split ``a=1,b=2`` SCRAM attribute lists (values may contain '=')."""
    out: dict[str, str] = {}
    for part in msg.split(","):
        if len(part) < 2 or part[1] != "=":
            raise ScramError(f"malformed {what}: {part!r}")
        out.setdefault(part[0], part[2:])
    return out


class ScramServer:
    """One SCRAM-SHA-256 exchange for one connection."""

    def __init__(
        self,
        password: str,
        iterations: int = DEFAULT_ITERATIONS,
        salt: bytes | None = None,
        server_nonce: str | None = None,
        cbind_data: bytes | None = None,
        plus_advertised: bool = False,
    ):
        # RFC 5929 tls-server-end-point data when this connection runs
        # over TLS and the server advertised SCRAM-SHA-256-PLUS; the
        # client's chosen gs2 header decides whether it is used
        self._cbind_data = cbind_data
        self._plus_advertised = plus_advertised
        self._cbind_used = False
        self._salt = salt if salt is not None else os.urandom(16)
        self._iterations = iterations
        self._server_nonce = server_nonce or secrets.token_urlsafe(18)
        salted = hashlib.pbkdf2_hmac(
            "sha256", password.encode("utf-8"), self._salt, iterations
        )
        self._stored_key = hashlib.sha256(_hmac(salted, b"Client Key")).digest()
        self._server_key = _hmac(salted, b"Server Key")
        self._client_first_bare: str | None = None
        self._server_first: str | None = None
        self._gs2_header: str | None = None
        self._nonce: str | None = None

    # ------------------------------------------------------------------ #

    def handle_client_first(self, data: bytes) -> bytes:
        """client-first-message → server-first-message bytes."""
        try:
            msg = data.decode("utf-8")
        except UnicodeDecodeError as e:
            raise ScramError(f"client-first not UTF-8: {e}") from None
        # gs2-header: "n" (no channel binding), "y" (client could bind,
        # believes the server cannot), or "p=<cb-type>" (bind). RFC 5802
        # downgrade rules: "p=…" is only legal when -PLUS was offered
        # AND this exchange runs on the -PLUS mechanism; "y" from a
        # client when the server DID advertise -PLUS is a
        # downgrade-attack signal → reject (PG does the same).
        if msg.startswith("p="):
            if self._cbind_data is None:
                raise ScramError(
                    "channel binding requested but SCRAM-SHA-256-PLUS "
                    "not offered"
                )
            cb_type, _, rest = msg[2:].partition(",")
            if cb_type != CHANNEL_BINDING_TYPE:
                raise ScramError(
                    f"unsupported channel-binding type {cb_type!r} "
                    f"(server implements {CHANNEL_BINDING_TYPE})"
                )
            self._cbind_used = True
            msg = f"p={cb_type},{rest}"
        elif msg.startswith("y,") and self._plus_advertised:
            raise ScramError(
                "channel binding downgrade detected: client sent gs2 "
                "'y' but SCRAM-SHA-256-PLUS was advertised"
            )
        elif not (msg.startswith("n,") or msg.startswith("y,")):
            raise ScramError(f"malformed gs2 header: {msg[:8]!r}")
        flag, authzid, bare = msg.split(",", 2)
        if authzid not in ("", None) and not authzid.startswith("a="):
            raise ScramError(f"malformed gs2 authzid: {authzid!r}")
        self._gs2_header = f"{flag},{authzid},"
        attrs = _attrs(bare, "client-first-message-bare")
        if "r" not in attrs:
            raise ScramError("client-first missing nonce (r=)")
        # n= (username) is ignored: PG authenticates the startup-packet
        # user; libpq sends an empty n= for exactly this reason
        self._client_first_bare = bare
        self._nonce = attrs["r"] + self._server_nonce
        self._server_first = (
            f"r={self._nonce},"
            f"s={base64.b64encode(self._salt).decode()},"
            f"i={self._iterations}"
        )
        return self._server_first.encode("utf-8")

    def handle_client_final(self, data: bytes) -> bytes:
        """client-final-message → server-final-message bytes (``v=…``);
        raises ScramError(28P01) on a bad proof."""
        if self._server_first is None:
            raise ScramError("client-final before client-first")
        try:
            msg = data.decode("utf-8")
        except UnicodeDecodeError as e:
            raise ScramError(f"client-final not UTF-8: {e}") from None
        attrs = _attrs(msg, "client-final-message")
        if not {"c", "r", "p"} <= set(attrs):
            raise ScramError("client-final missing c=/r=/p=")
        # channel-binding attribute: base64 of the gs2 header plus —
        # when the client chose "p=tls-server-end-point" — the RFC 5929
        # binding data (hash of OUR certificate). A MITM terminating
        # TLS presents a different cert, the hashes split, and the
        # proof check below fails even with a stolen password.
        cbind_raw = self._gs2_header.encode()
        if self._cbind_used:
            cbind_raw += self._cbind_data
        want_c = base64.b64encode(cbind_raw).decode()
        if attrs["c"] != want_c:
            raise ScramError(
                f"channel-binding data mismatch: {attrs['c']!r} != {want_c!r}"
            )
        if attrs["r"] != self._nonce:
            raise ScramError("nonce mismatch in client-final")
        try:
            proof = base64.b64decode(attrs["p"], validate=True)
        except Exception:
            raise ScramError("client proof is not valid base64") from None
        if len(proof) != 32:
            raise ScramError("client proof must be 32 bytes for SHA-256")
        without_proof = msg[: msg.rindex(",p=")]
        auth_message = ",".join(
            (self._client_first_bare, self._server_first, without_proof)
        ).encode("utf-8")
        client_signature = _hmac(self._stored_key, auth_message)
        client_key = bytes(a ^ b for a, b in zip(proof, client_signature))
        if not hmac.compare_digest(
            hashlib.sha256(client_key).digest(), self._stored_key
        ):
            raise ScramError("SCRAM proof verification failed", "28P01")
        server_signature = _hmac(self._server_key, auth_message)
        return b"v=" + base64.b64encode(server_signature)
