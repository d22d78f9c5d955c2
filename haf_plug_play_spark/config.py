"""Config-file loading — ≙ the reference's ``Config`` (config.py:12-56):
a flat ``key=value`` file holding deployment settings, created as a blank
template on first run so operators fill it in rather than guessing field
names. The reference's fields are PostgreSQL + server coordinates; this
engine's are storage paths and Spark sizing.

Reference-defect note (SURVEY §7.4 — implement the intent, not the
accident): the reference calls ``os._exit(1)`` from library code on a
missing file and asserts on unknown keys. Here both conditions raise
typed exceptions — the CLI decides process exit, and an embedding caller
(tests, notebooks) gets a catchable error instead of a dead interpreter.
"""

from __future__ import annotations

import os

# engine-relevant settings; the reference's db_* coordinates map to
# storage paths, server_* keep their meaning (config.py:6-9)
CONFIG_FIELDS = [
    "ops_path",       # op-log parquet root
    "trx_path",       # transactions parquet root (optional at runtime)
    "out_dir",        # derived-table output root
    "step",           # micro-batch chunk size in blocks
    "shuffle_partitions",
    "server_host",
    "server_port",
]

_INT_FIELDS = {"step", "shuffle_partitions", "server_port"}


class ConfigError(Exception):
    """Invalid or missing configuration (catchable, unlike os._exit)."""


def create_blank(config_file: str) -> None:
    """Write a template listing every field (reference config.py:24-32)."""
    parent = os.path.dirname(os.path.abspath(config_file))
    os.makedirs(parent, exist_ok=True)
    with open(config_file, "w", encoding="utf-8") as f:
        f.writelines(f"{field}=\n" for field in CONFIG_FIELDS)


def load_config(config_file: str, create_if_missing: bool = True) -> dict:
    """Parse ``key=value`` lines into a validated dict. Unknown keys and
    malformed integers raise ``ConfigError`` naming the offender; blank
    values are omitted (callers apply their own defaults). A missing file
    is templated (opt-out via ``create_if_missing=False``) and reported —
    the reference's first-run UX, minus the hard process kill."""
    if not os.path.exists(config_file):
        if create_if_missing:
            create_blank(config_file)
            raise ConfigError(
                f"no config file at {config_file}; a blank template was "
                "created — populate it and re-run"
            )
        raise ConfigError(f"no config file at {config_file}")
    values: dict[str, object] = {}
    with open(config_file, encoding="utf-8") as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "=" not in line:
                # a silently-dropped malformed line would surface later as
                # a baffling "field missing" error pointing away from it
                raise ConfigError(
                    f"{config_file}:{lineno}: malformed line {line!r} "
                    "(expected key=value)"
                )
            key, _, raw = line.partition("=")
            key, raw = key.strip(), raw.strip()
            if key not in CONFIG_FIELDS:
                raise ConfigError(
                    f"{config_file}:{lineno}: invalid config key {key!r} "
                    f"(known: {', '.join(CONFIG_FIELDS)})"
                )
            if not raw:
                continue
            if key in _INT_FIELDS:
                try:
                    values[key] = int(raw)
                except ValueError as exc:
                    raise ConfigError(
                        f"{config_file}:{lineno}: {key} must be an integer, "
                        f"got {raw!r}"
                    ) from exc
            else:
                values[key] = raw
    return values
