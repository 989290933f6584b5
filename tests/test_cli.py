"""CLI end-to-end: dry-run and execute over testdata parquet."""

from data_warehouse_migrate_spark.cli import main


def test_cli_dry_run(spark, sf_dir, tmp_path, capsys):
    rc = main([
        "--source-path", f"{sf_dir}/orders.parquet",
        "--destination-path", str(tmp_path / "orders_out"),
        "--mode", "overwrite", "--dry-run", "--yes",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "o_orderkey" in out


def test_cli_migrates_table(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "orders_out")
    rc = main([
        "--source-path", f"{sf_dir}/orders.parquet",
        "--destination-path", dest,
        "--mode", "overwrite", "--yes",
    ])
    assert rc == 0
    back = spark.read.parquet(dest)
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert back.count() == src.count()


def test_cli_config_file_with_mapping(spark, sf_dir, tmp_path):
    import json

    dest = str(tmp_path / "mapped_out")
    cfg = {
        "source": {"path": f"{sf_dir}/orders.parquet", "table_name": "orders"},
        "destination": {"path": dest},
        "run": {"mode": "overwrite"},
        "mappings": {
            "default": {"computed": {"tag": "concat('X-', o_orderstatus)"}},
            "tables": [{"source_table": "orders",
                        "rename": {"o_totalprice": "total_price"}}],
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    rc = main(["--config", str(cfg_path), "--yes"])
    assert rc == 0
    back = spark.read.parquet(dest)
    assert "total_price" in back.columns and "tag" in back.columns
    assert back.filter("tag NOT LIKE 'X-%'").count() == 0


def test_cli_stream_migration(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.read.parquet(f"{sf_dir}/orders.parquet").limit(200) \
        .write.mode("overwrite").parquet(src)
    rc = main([
        "--source-path", src, "--destination-path", dest,
        "--mode", "overwrite", "--yes",
        "--stream", "--checkpoint", ckpt,
    ])
    assert rc == 0
    assert spark.read.parquet(dest).count() == 200
    # a second catch-up run with nothing new writes nothing new
    rc = main([
        "--source-path", src, "--destination-path", dest,
        "--mode", "overwrite", "--yes",
        "--stream", "--checkpoint", ckpt,
    ])
    assert rc == 0
    assert spark.read.parquet(dest).count() == 200


def test_cli_stream_requires_checkpoint(tmp_path, capsys):
    rc = main([
        "--source-path", str(tmp_path), "--destination-path", str(tmp_path / "o"),
        "--stream", "--yes",
    ])
    assert rc == 2
    assert "checkpoint" in capsys.readouterr().err


def test_cli_incremental_keys(tmp_path, spark):
    src1 = str(tmp_path / "s1"); src2 = str(tmp_path / "s2")
    dst = str(tmp_path / "d")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, t string") \
        .write.parquet(src1)
    spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k long, t string") \
        .write.parquet(src2)
    assert main(["--source-path", src1, "--destination-path", dst,
                 "--incremental-keys", "k", "--yes"]) == 0
    assert main(["--source-path", src2, "--destination-path", dst,
                 "--incremental-keys", "k", "--yes"]) == 0
    rows = {r.k: r.t for r in spark.read.parquet(dst).collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}


def test_cli_verify_flag(spark, sf_dir, tmp_path, capsys):
    import json

    dest = str(tmp_path / "verified_out")
    rc = main([
        "--source-path", f"{sf_dir}/orders.parquet",
        "--destination-path", dest,
        "--mode", "overwrite", "--yes", "--verify",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["verification"]["verified"] is True
    assert out["verification"]["checksum_match"] is True


def test_cli_target_file_mb(spark, sf_dir, tmp_path):
    import glob
    import json as _json

    dest = str(tmp_path / "sized_out")
    rc = main([
        "--source-path", f"{sf_dir}/orders.parquet",
        "--destination-path", dest,
        "--mode", "overwrite", "--yes",
        "--target-file-mb", "1",
    ])
    assert rc == 0
    # sf0.001 orders are well under 1 MB -> exactly one compacted file
    assert len(glob.glob(f"{dest}/part-*")) == 1
    back = spark.read.parquet(dest)
    assert back.count() == spark.read.parquet(
        f"{sf_dir}/orders.parquet").count()
