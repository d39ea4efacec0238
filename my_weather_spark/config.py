"""Control-plane config: dynamic structs, env-var contracts, secrets.

Re-expression of the reference's configuration layer:
* ``DataClass`` — dynamic attribute object over kwargs with nested
  wrapping (reference: weather/utilities/data_class.py:5-37).
* ``EnvVarConfig`` — declared-properties config read from environment
  variables; a missing variable errors with a fuzzy best-match
  suggestion (reference: weather/interfaces/config.py:54-59, the J4
  control-plane twin).
* ``SecretBox`` — PBKDF2-SHA256 (100k iterations) key derivation +
  Fernet encrypt/decrypt for secret values (reference:
  weather/utilities/simple_crypto.py:28-45).

All of this is DRIVER-side only — secrets and config never enter the
data plane (SURVEY.md §2 F9: control-plane only).
"""

from __future__ import annotations

import base64
import difflib
import hashlib
import os
from typing import Any, Iterable


class DataClass:
    """Attribute access over arbitrary kwargs; nested dicts wrap
    recursively. len() = number of attributes; repr lists them."""

    def __init__(self, **kwargs: Any) -> None:
        for key, value in kwargs.items():
            if isinstance(value, dict):
                value = DataClass(**value)
            elif isinstance(value, (list, tuple)):
                value = type(value)(
                    DataClass(**v) if isinstance(v, dict) else v for v in value
                )
            setattr(self, key, value)

    def __len__(self) -> int:
        return len(self.__dict__)

    def __iter__(self):
        return iter(self.__dict__.items())

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __eq__(self, other: object) -> bool:
        return isinstance(other, DataClass) and self.__dict__ == other.__dict__

    def __hash__(self) -> int:
        # defining __eq__ alone sets __hash__ to None (unhashable);
        # hash by sorted items so equal configs collide as dict keys.
        # Hash VALUES (recursing into lists), not reprs: __eq__ uses
        # dict equality, where 1 == 1.0, so repr-based hashing would
        # give equal configs different hashes (dict/set duplicates).
        # repr stays as the fallback for unhashable leaves only.
        def hv(v):
            if isinstance(v, (list, tuple)):
                return hash(tuple(hv(x) for x in v))
            try:
                return hash(v)
            except TypeError:
                return hash(repr(v))

        return hash(tuple(sorted((k, hv(v)) for k, v in self.__dict__.items())))

    def __repr__(self) -> str:
        inner = ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())
        return f"DataClass({inner})"

    __str__ = __repr__


class ConfigError(KeyError):
    pass


class EnvVarConfig:
    """Config contract over environment variables.

    ``properties`` declares the expected names; reading an undeclared
    property raises, and a declared-but-unset variable raises with the
    closest-named EXISTING env var as a suggestion (fuzzy match).
    """

    def __init__(self, properties: Iterable[str], prefix: str = "") -> None:
        self.properties = list(properties)
        self.prefix = prefix

    def _var(self, prop: str) -> str:
        return f"{self.prefix}{prop}".upper()

    def get(self, prop: str) -> str:
        if prop not in self.properties:
            raise ConfigError(
                f"property {prop!r} not declared; declared: {self.properties}"
            )
        var = self._var(prop)
        val = os.environ.get(var)
        if val is None:
            candidates = difflib.get_close_matches(var, os.environ.keys(), n=1)
            hint = f"; did you mean {candidates[0]!r}?" if candidates else ""
            raise ConfigError(f"environment variable {var!r} is not set{hint}")
        return val

    def unpack(self) -> DataClass:
        """All declared properties as a DataClass (validates all)."""
        return DataClass(**{p: self.get(p) for p in self.properties})


class SecretBox:
    """Symmetric secret encryption: PBKDF2-SHA256(100_000) -> Fernet.

    Same construction as the reference (password+salt derive the key;
    values round-trip as urlsafe tokens suitable for env vars).
    """

    ITERATIONS = 100_000

    def __init__(self, password: str, salt: str) -> None:
        from cryptography.fernet import Fernet

        key = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), salt.encode(), self.ITERATIONS
        )
        self._fernet = Fernet(base64.urlsafe_b64encode(key))

    def encrypt(self, plaintext: str) -> str:
        return self._fernet.encrypt(plaintext.encode()).decode()

    def decrypt(self, token: str) -> str:
        return self._fernet.decrypt(token.encode()).decode()


class EncryptedEnvVarConfig(EnvVarConfig):
    """Env-var config whose stored values are SecretBox tokens."""

    def __init__(
        self, properties: Iterable[str], password: str, salt: str, prefix: str = ""
    ) -> None:
        super().__init__(properties, prefix)
        self.box = SecretBox(password, salt)

    def get(self, prop: str) -> str:
        return self.box.decrypt(super().get(prop))
