"""Config layer: JSON file + env-var interpolation + grouped-key
normalization + CLI > file > env precedence merge + per-table mapping
selection (reference ``config_loader.py:63-289``).

Pure Python — runs on the driver before any Spark plan is built.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

logger = logging.getLogger(__name__)

# keys coerced during normalization
_INT_KEYS = ("batch_size", "limit", "shuffle_partitions")
_BOOL_KEYS = ("dry_run", "preserve_string_null_tokens",
              "string_null_tokens_case_insensitive", "treat_empty_string_as_null")
# every list-shaped key: env/file values arrive as comma strings and MUST
# split here — a string passed through is iterated character-by-character
# downstream (e.g. non_nullable='id,name' would match no columns and
# silently disable the null-policy gate)
_LIST_KEYS = ("string_null_tokens", "non_nullable",
              "source_partition_columns", "incremental_keys",
              "write_partition_by")

_TRUTHY = {"1", "true", "yes", "y", "on"}
_FALSY = {"0", "false", "no", "n", "off"}


def _expand_env(value: Any) -> Any:
    """Recursively expand $VAR / ${VAR} placeholders in strings."""
    if isinstance(value, str):
        return os.path.expandvars(value)
    if isinstance(value, list):
        return [_expand_env(v) for v in value]
    if isinstance(value, dict):
        return {k: _expand_env(v) for k, v in value.items()}
    return value


def _to_bool(val: Any) -> bool | None:
    if val is None:
        return None
    if isinstance(val, bool):
        return val
    s = str(val).strip().lower()
    if s in _TRUTHY:
        return True
    if s in _FALSY:
        return False
    return None


def _to_int(val: Any) -> int | None:
    if val is None or val == "":
        return None
    try:
        return int(str(val))
    except (TypeError, ValueError):
        return None


def _to_list(val: Any) -> list | None:
    if val is None:
        return None
    if isinstance(val, list):
        return val
    if isinstance(val, str):
        return [p.strip() for p in val.split(",") if p.strip()]
    return None


def load_config_file(path: str) -> dict[str, Any]:
    """Load a JSON config file with env placeholder expansion."""
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    return _expand_env(raw)


# grouped section → (child key → flat key); None means same name prefixed
_GROUPS: dict[str, dict[str, str]] = {
    "source": {
        "path": "source_path", "format": "source_format",
        "table_name": "source_table_name", "project_id": "source_project_id",
        "partition_columns": "source_partition_columns",
        "jdbc": "source_jdbc",
    },
    "destination": {
        "type": "destination_type", "path": "destination_path",
        "format": "destination_format", "table_name": "destination_table_name",
        "project_id": "destination_project_id", "dataset_id": "destination_dataset_id",
        "jdbc": "destination_jdbc",
    },
    "run": {
        "mode": "mode", "batch_size": "batch_size", "log_level": "log_level",
        "dry_run": "dry_run", "limit": "limit",
    },
    "compat": {
        "preserve_string_null_tokens": "preserve_string_null_tokens",
        "string_null_tokens": "string_null_tokens",
        "null_on_non_nullable": "null_on_non_nullable",
        "null_fill_sentinel": "null_fill_sentinel",
        "string_null_tokens_case_insensitive": "string_null_tokens_case_insensitive",
        "treat_empty_string_as_null": "treat_empty_string_as_null",
    },
}


def normalize_config(cfg: dict[str, Any]) -> dict[str, Any]:
    """Flatten grouped keys (source/destination/run/compat) into flat keys;
    already-flat keys win; coerce ints/bools/lists."""
    # flat keys FIRST — including dict-valued ones like source_jdbc —
    # so "already-flat keys win" holds for every value shape (dict-valued
    # flat keys previously lost to their grouped twin)
    out: dict[str, Any] = {k: v for k, v in cfg.items()
                           if not isinstance(v, dict) or k not in _GROUPS}
    for group, keymap in _GROUPS.items():
        section = cfg.get(group)
        if not isinstance(section, dict):
            continue
        for child, flat in keymap.items():
            if child in section:
                out.setdefault(flat, section[child])

    for k in _INT_KEYS:
        iv = _to_int(out.get(k))
        if iv is not None:
            out[k] = iv
    for k in _BOOL_KEYS:
        bv = _to_bool(out.get(k))
        if bv is not None:
            out[k] = bv
    for k in _LIST_KEYS:
        lv = _to_list(out.get(k))
        if lv is not None:
            out[k] = lv
    return out


def _find_unescaped(s: str, ch: str, start: int) -> int:
    """Index of the first ``ch`` in ``s`` at or after ``start`` that is
    not preceded by an odd number of backslashes; -1 if none. The
    closing-quote scanner for :func:`load_dotenv` (ADVICE r11 — a cut at
    the first *occurrence* truncated ``KEY="a\\"b"`` at the escaped
    quote)."""
    i = start
    while True:
        i = s.find(ch, i)
        if i == -1:
            return -1
        bs = 0
        j = i - 1
        while j >= 0 and s[j] == "\\":
            bs += 1
            j -= 1
        if bs % 2 == 0:
            return i
        i += 1


def load_dotenv(path: str | None = None,
                environ: dict[str, str] | None = None,
                override: bool = False) -> list[str]:
    """Load ``KEY=VALUE`` lines from a ``.env`` file into the process
    environment (reference ``config.py:9-23``, which auto-loads via the
    python-dotenv package at import time; this engine has no such
    dependency and loads EXPLICITLY from the CLI entry instead of as an
    import side effect — library imports must not mutate the
    environment).

    Search order when ``path`` is None mirrors the reference: a ``.env``
    beside the package's parent (project root), then the current working
    directory; the first that exists wins, no file is fine. Caveat: when
    the package is installed as a wheel, "project root" resolves to the
    site-packages directory — a stray ``.env`` there would be picked up
    (ADVICE r10); pass ``path`` explicitly in packaged deployments.
    Parser covers the dotenv subset the reference relies on: blank lines
    and ``#`` comments skipped, optional ``export `` prefix,
    single/double quotes stripped, whitespace trimmed, and — matching
    python-dotenv — an unquoted value is cut at the first
    whitespace-preceded ``#`` (``KEY=val  # comment`` loads ``val``;
    quoted values keep their ``#`` verbatim). A quoted value ends at the
    first UNESCAPED matching quote, and ``\\<quote>`` / ``\\\\`` inside
    are unescaped (``KEY="a\\"b"`` loads ``a"b``, matching
    python-dotenv); full double-quote escape decoding (``\\n`` to
    newline etc.) is OUTSIDE the supported subset — such sequences stay
    literal. Matching python-dotenv's
    default, existing variables are NOT overridden unless
    ``override=True`` — a real environment always beats a checked-in
    file. Returns the list of keys actually set (for logging/tests).
    """
    env = environ if environ is not None else os.environ
    if path is None:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for cand in (os.path.join(here, ".env"),
                     os.path.join(os.getcwd(), ".env")):
            if os.path.isfile(cand):
                path = cand
                break
    if path is None or not os.path.isfile(path):
        return []
    loaded: list[str] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            key, _, rawval = line.partition("=")
            key, val = key.strip(), rawval.strip()
            if not key:
                continue
            close = (_find_unescaped(val, val[0], 1)
                     if val[:1] in ("'", '"') else -1)
            if close != -1:
                # quoted value: the quote pair delimits it — anything
                # after the closing quote (an inline comment, stray
                # text) is dropped, and the quotes are stripped even
                # when a comment follows ('KEY="secret" # prod' must
                # load secret, not "secret" with literal quotes). The
                # closing quote is the first UNESCAPED occurrence
                # (ADVICE r11: KEY="a\"b" must load 'a"b', not 'a\'),
                # and \<quote> / \\ inside are unescaped to match
                # python-dotenv; other escape sequences (\n, \t) stay
                # literal — outside the supported subset, documented.
                q = val[0]
                inner = val[1:close]
                # ADVICE r12: surface (at debug level) escape sequences
                # outside the supported subset — they stay literal here
                # but python-dotenv's decode_escapes would decode e.g.
                # \n/\t in double-quoted values, a documented divergence
                # a user migrating a .env may trip on silently.
                i = 0
                while i < len(inner) - 1:
                    if inner[i] == "\\":
                        if inner[i + 1] not in (q, "\\"):
                            logger.debug(
                                "dotenv %s: unrecognized escape \\%s in "
                                "quoted value of %r left literal "
                                "(supported subset: \\%s and \\\\)",
                                path, inner[i + 1], key, q)
                            break
                        i += 2
                    else:
                        i += 1
                val = (inner
                       .replace("\\" + q, q)
                       .replace("\\\\", "\\"))
            else:
                # unquoted values: a '#' preceded by whitespace starts an
                # inline comment (python-dotenv semantics; ADVICE r10 —
                # 'KEY=val # note' must load 'val', not 'val # note').
                # 'KEY= # note' is all comment (empty value); a '#' with
                # no whitespace before it is part of the value.
                if val.startswith("#") and rawval != rawval.lstrip():
                    val = ""
                else:
                    for i in range(1, len(val)):
                        if val[i] == "#" and val[i - 1].isspace():
                            val = val[:i].rstrip()
                            break
            if override or key not in env:
                env[key] = val
                loaded.append(key)
    return loaded


def env_config(environ: dict[str, str] | None = None) -> dict[str, Any]:
    """Environment-variable config source (lowest precedence)."""
    env = environ if environ is not None else os.environ
    prefix = "DWMS_"
    out: dict[str, Any] = {}
    for k, v in env.items():
        if k.startswith(prefix):
            out[k[len(prefix):].lower()] = v
    return out


def merge_config(cli_args: dict[str, Any] | None = None,
                 file_cfg: dict[str, Any] | None = None,
                 env_cfg: dict[str, Any] | None = None) -> dict[str, Any]:
    """Three-way precedence merge: CLI > file > env (reference
    ``config_loader.py:171-248``). ``None`` CLI values never mask
    file/env values."""
    cli_args = {k: v for k, v in (cli_args or {}).items() if v is not None}
    file_cfg = normalize_config(file_cfg or {})
    env_cfg = normalize_config(env_cfg or {})
    merged: dict[str, Any] = {}
    merged.update({k: v for k, v in env_cfg.items() if v is not None})
    merged.update({k: v for k, v in file_cfg.items() if v is not None})
    merged.update(cli_args)
    # type backstops after merge
    for k in _INT_KEYS:
        iv = _to_int(merged.get(k))
        if iv is not None:
            merged[k] = iv
    for k in _BOOL_KEYS:
        bv = _to_bool(merged.get(k))
        if bv is not None:
            merged[k] = bv
    for k in _LIST_KEYS:
        lv = _to_list(merged.get(k))
        if lv is not None:
            merged[k] = lv
    return merged


def select_table_mapping(raw_cfg: dict[str, Any],
                         source_table_name: str | None) -> dict[str, Any] | None:
    """Pick the mapping plan for one table: ``mappings.default`` as the base,
    overridden by the first ``mappings.tables[]`` entry whose
    ``source_table`` matches case-insensitively (reference
    ``config_loader.py:251-289``)."""
    mappings = raw_cfg.get("mappings") if isinstance(raw_cfg, dict) else None
    if not isinstance(mappings, dict):
        return None
    result: dict[str, Any] = {}
    default_map = mappings.get("default")
    if isinstance(default_map, dict):
        result.update(default_map)
    if source_table_name:
        for item in mappings.get("tables") or []:
            if not isinstance(item, dict):
                continue
            if str(item.get("source_table", "")).strip().lower() == \
                    str(source_table_name).strip().lower():
                result.update(item)
                break
    for k in ("include", "exclude", "order"):
        if isinstance(result.get(k), str):
            lv = _to_list(result[k])
            if lv is not None:
                result[k] = lv
    return result or None
