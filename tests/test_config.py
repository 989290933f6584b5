"""Config layer: env expansion, grouped keys, precedence, mapping selection
(reference config_loader.py semantics)."""

import json

from data_warehouse_migrate_spark.config import (
    env_config,
    load_config_file,
    merge_config,
    normalize_config,
    select_table_mapping,
)


def test_env_expansion(tmp_path, monkeypatch):
    monkeypatch.setenv("MYVAR", "expanded")
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"source": {"path": "${MYVAR}/data"}}))
    cfg = load_config_file(str(p))
    assert cfg["source"]["path"] == "expanded/data"


def test_grouped_key_normalization():
    cfg = normalize_config({
        "source": {"path": "/s", "table_name": "t"},
        "destination": {"type": "parquet", "path": "/d"},
        "run": {"mode": "append", "batch_size": "500", "dry_run": "true"},
        "compat": {"preserve_string_null_tokens": "false"},
        "already_flat": 1,
    })
    assert cfg["source_path"] == "/s"
    assert cfg["source_table_name"] == "t"
    assert cfg["destination_type"] == "parquet"
    assert cfg["batch_size"] == 500          # int coercion
    assert cfg["dry_run"] is True            # bool coercion
    assert cfg["preserve_string_null_tokens"] is False
    assert cfg["already_flat"] == 1


def test_flat_keys_win_over_grouped():
    cfg = normalize_config({"source_path": "/flat", "source": {"path": "/grouped"}})
    assert cfg["source_path"] == "/flat"


def test_precedence_cli_file_env():
    cli = {"mode": "overwrite", "limit": None}
    file_cfg = {"mode": "append", "source_path": "/file", "limit": 10}
    env = {"mode": "ignored", "source_path": "/env", "log_level": "DEBUG"}
    merged = merge_config(cli, file_cfg, env)
    assert merged["mode"] == "overwrite"      # CLI wins
    assert merged["source_path"] == "/file"   # file beats env
    assert merged["log_level"] == "DEBUG"     # env fills the rest
    assert merged["limit"] == 10              # None CLI value doesn't mask


def test_env_config_prefix(monkeypatch):
    monkeypatch.setenv("DWMS_SOURCE_PATH", "/from-env")
    monkeypatch.setenv("UNRELATED", "x")
    env = env_config()
    assert env["source_path"] == "/from-env"
    assert "unrelated" not in env


def test_string_null_tokens_list_coercion():
    merged = merge_config({}, {"string_null_tokens": "nan, none ,null"}, {})
    assert merged["string_null_tokens"] == ["nan", "none", "null"]


def test_select_table_mapping_default_plus_table():
    raw = {"mappings": {
        "default": {"exclude": ["pt"], "order": ["id"]},
        "tables": [
            {"source_table": "ODS_LM_SPU", "rename": {"sku_code": "sku"},
             "exclude": "pt,tmp"},
            {"source_table": "other", "rename": {"x": "y"}},
        ],
    }}
    m = select_table_mapping(raw, "ods_lm_spu")  # case-insensitive
    assert m["rename"] == {"sku_code": "sku"}
    assert m["exclude"] == ["pt", "tmp"]  # table overrides default + list coercion
    assert m["order"] == ["id"]           # default retained
    assert select_table_mapping(raw, "unknown") == {"exclude": ["pt"], "order": ["id"]}
    assert select_table_mapping({}, "t") is None


def test_load_dotenv_parses_and_respects_existing(tmp_path):
    """Reference config.py:9-23 auto-loads .env; engine equivalent is the
    explicit, dependency-free load_dotenv — dotenv subset semantics:
    comments/blank lines skipped, export prefix, quotes stripped, and
    (python-dotenv default) existing variables never overridden."""
    from data_warehouse_migrate_spark.config import load_dotenv

    p = tmp_path / ".env"
    p.write_text(
        "# comment\n"
        "\n"
        "DWMS_BATCH_SIZE=50000\n"
        "export DWMS_MODE=full\n"
        "DWMS_QUOTED=\"a b\"\n"
        "DWMS_SINGLE='x'\n"
        "ALREADY=from_file\n"
        "not a kv line\n"
        "=novalue\n")
    env = {"ALREADY": "from_env"}
    loaded = load_dotenv(str(p), environ=env)
    assert env["DWMS_BATCH_SIZE"] == "50000"
    assert env["DWMS_MODE"] == "full"
    assert env["DWMS_QUOTED"] == "a b"
    assert env["DWMS_SINGLE"] == "x"
    assert env["ALREADY"] == "from_env"          # never overridden
    assert "ALREADY" not in loaded
    assert set(loaded) == {"DWMS_BATCH_SIZE", "DWMS_MODE",
                           "DWMS_QUOTED", "DWMS_SINGLE"}
    # override=True flips the precedence explicitly
    env2 = {"ALREADY": "from_env"}
    load_dotenv(str(p), environ=env2, override=True)
    assert env2["ALREADY"] == "from_file"
    # missing file is fine
    assert load_dotenv(str(tmp_path / "nope.env"), environ={}) == []


def test_load_dotenv_inline_comments(tmp_path):
    """ADVICE r10: unquoted values cut at the first whitespace-preceded
    '#' (python-dotenv semantics the docstring claims); quoted values
    keep '#' verbatim; '#' with no whitespace before it is data."""
    from data_warehouse_migrate_spark.config import load_dotenv

    p = tmp_path / ".env"
    p.write_text(
        "A=val # trailing comment\n"
        "B=\"kept # inside quotes\" \n"
        "C=anchor#notacomment\n"
        "D= # all comment\n"
        "E='x # y'\n"
        "F=tab\t# tab counts as whitespace\n"
        "G=\"secret\" # comment after closing quote\n"
        "H='q1'#nospace still ends at the closing quote\n")
    env: dict = {}
    load_dotenv(str(p), environ=env)
    assert env["A"] == "val"
    assert env["B"] == "kept # inside quotes"
    assert env["C"] == "anchor#notacomment"
    assert env["D"] == ""
    assert env["E"] == "x # y"
    assert env["F"] == "tab"
    # quotes stripped even with trailing comment (review r11: the old
    # first==last check fell through and kept literal quote chars)
    assert env["G"] == "secret"
    assert env["H"] == "q1"


def test_load_dotenv_feeds_env_config(tmp_path):
    """End-to-end: .env -> process-env dict -> env_config -> merge, the
    reference's lowest-precedence path."""
    from data_warehouse_migrate_spark.config import env_config, load_dotenv, merge_config

    p = tmp_path / ".env"
    p.write_text("DWMS_SOURCE_FORMAT=csv\nDWMS_LIMIT=7\n")
    env: dict = {}
    load_dotenv(str(p), environ=env)
    merged = merge_config({}, {}, env_config(env))
    assert merged["source_format"] == "csv"
    assert merged["limit"] == 7


def test_load_dotenv_property_quoted_roundtrip(tmp_path):
    """Property (review r11): for any value free of quotes/newlines,
    writing it double-quoted with a trailing inline comment loads back
    EXACTLY the value — no wrapping quote chars (the r11 bug), no
    comment residue, regardless of '#' or whitespace inside the value."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_warehouse_migrate_spark.config import load_dotenv

    val = st.text(alphabet=st.characters(blacklist_characters="'\n\r\0",
                                         blacklist_categories=("Cs",)),
                  max_size=20)

    @settings(max_examples=40, deadline=None)
    @given(val)
    def prop(v):
        # dotenv-escape on write (backslashes and embedded quotes), the
        # way a writer targeting python-dotenv must — since the ADVICE
        # r11 fix the parser honors \" / \\ instead of cutting at the
        # first quote occurrence, so raw backslash runs no longer
        # round-trip by accident; escaped ones round-trip by contract
        enc = v.replace("\\", "\\\\").replace('"', '\\"')
        p = tmp_path / "rt.env"
        p.write_text(f'K="{enc}" # trailing comment\n', encoding="utf-8")
        env: dict = {}
        load_dotenv(str(p), environ=env)
        assert env["K"] == v

    prop()


def test_load_dotenv_escaped_quotes(tmp_path):
    """ADVICE r11: a quoted value ends at the first UNESCAPED matching
    quote — KEY="a\\"b" loads 'a"b' (python-dotenv), not 'a\\' (the old
    first-occurrence cut); \\\\ unescapes to a single backslash; other
    escape sequences stay literal (documented supported subset)."""
    from data_warehouse_migrate_spark.config import load_dotenv

    p = tmp_path / ".env"
    p.write_text(
        'A="a\\"b" # comment\n'          # escaped double quote
        'B="x\\\\" # c\n'                # escaped backslash then closer
        "C='it\\'s'\n"                   # escaped single quote
        'D="tab\\there"\n'               # \t stays literal (subset)
        'E="trail\\\\\\"q" # c\n',       # \\ then \" inside
        encoding="utf-8")
    env: dict = {}
    load_dotenv(str(p), environ=env)
    assert env["A"] == 'a"b'
    assert env["B"] == "x\\"
    assert env["C"] == "it's"
    assert env["D"] == "tab\\there"
    assert env["E"] == 'trail\\"q'


def test_load_dotenv_property_never_overrides(tmp_path):
    """Property: for ANY file content, load_dotenv with override=False
    never changes a pre-existing key, and every key it reports in the
    return list was actually absent before and set after."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_warehouse_migrate_spark.config import load_dotenv

    key = st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                                         whitelist_characters="_"),
                  min_size=1, max_size=8)
    val = st.text(alphabet=st.characters(blacklist_characters="\n\r\0",
                                         blacklist_categories=("Cs",)),
                  max_size=12)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(key, val), max_size=6),
           st.dictionaries(key, val, max_size=4))
    def prop(lines, pre_env):
        p = tmp_path / "prop.env"
        p.write_text("".join(f"{k}={v}\n" for k, v in lines),
                     encoding="utf-8")
        env = dict(pre_env)
        loaded = load_dotenv(str(p), environ=env)
        for k, v in pre_env.items():
            assert env[k] == v                      # never overridden
        for k in loaded:
            assert k not in pre_env and k in env    # genuinely new

    prop()
