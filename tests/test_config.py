"""Config/crypto control-plane tests (reference: test_data_class.py,
test_interfaces_config.py semantics per SURVEY.md §5)."""

import pytest

from my_weather_spark.config import (
    ConfigError,
    DataClass,
    EncryptedEnvVarConfig,
    EnvVarConfig,
    SecretBox,
)


def test_data_class_attribute_access():
    d = DataClass(name="Superstation", count=3, nested={"a": 1, "b": {"c": 2}})
    assert d.name == "Superstation"
    assert d.count == 3
    assert d.nested.a == 1
    assert d.nested.b.c == 2
    assert len(d) == 3
    assert "name" in d
    assert "Superstation" in repr(d)


def test_data_class_list_wrapping_and_eq():
    d = DataClass(mods=[{"x": 1}, {"x": 2}])
    assert d.mods[0].x == 1 and d.mods[1].x == 2
    assert DataClass(a=1) == DataClass(a=1)
    assert DataClass(a=1) != DataClass(a=2)


def test_env_config_reads_and_validates(monkeypatch):
    monkeypatch.setenv("WX_USERNAME", "bob")
    monkeypatch.setenv("WX_PASSWORD", "hunter2")
    cfg = EnvVarConfig(["username", "password"], prefix="WX_")
    assert cfg.get("username") == "bob"
    unpacked = cfg.unpack()
    assert unpacked.password == "hunter2"
    with pytest.raises(ConfigError, match="not declared"):
        cfg.get("token")


def test_env_config_fuzzy_suggestion(monkeypatch):
    monkeypatch.setenv("WX_USERNAMES", "bob")  # near-miss name
    cfg = EnvVarConfig(["username"], prefix="WX_")
    with pytest.raises(ConfigError, match="WX_USERNAMES"):
        cfg.get("username")


def test_secret_box_round_trip():
    box = SecretBox("password123", "salty")
    token = box.encrypt("secret-value")
    assert token != "secret-value"
    assert box.decrypt(token) == "secret-value"
    # wrong password fails
    with pytest.raises(Exception):
        SecretBox("wrong", "salty").decrypt(token)


def test_encrypted_env_config(monkeypatch):
    box = SecretBox("pw", "na")
    monkeypatch.setenv("NETATMO_CLIENT_SECRET", box.encrypt("s3cr3t"))
    cfg = EncryptedEnvVarConfig(["client_secret"], password="pw", salt="na", prefix="NETATMO_")
    assert cfg.get("client_secret") == "s3cr3t"
