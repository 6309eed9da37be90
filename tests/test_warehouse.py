import pytest

from locopy_spark.warehouse import Redshift, Snowflake, Warehouse


def test_facade_roundtrip(spark, tmp_path):
    import pandas as pd

    wh = Redshift(spark=spark, stage_root=str(tmp_path / "stage"))
    wh.connect()
    # managed-table leftovers from prior runs break saveAsTable: drop
    # the catalog entry AND the warehouse directory
    import shutil

    for t in ("wh_src", "wh_back", "wh_lac"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    # insert → unload → stage hop → copy back
    pdf = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    wh.insert_dataframe_to_table(pdf, "wh_src")
    spark.sql("SELECT * FROM wh_src").createOrReplaceTempView("wh_src_v")
    out_dir = str(tmp_path / "out")
    wh.unload(
        "SELECT k, v FROM wh_src_v ORDER BY k",
        out_dir,
        unload_options=["HEADER", "PARALLEL OFF", "DELIMITER '|'"],
    )
    import glob

    files = glob.glob(out_dir + "/*.csv")
    assert len(files) == 1  # PARALLEL OFF → one file
    local = files[0]
    staged = wh.upload_to_internal(local, "in")
    loaded = wh.copy(
        "wh_back", staged, delim="|", copy_options=["IGNOREHEADER 1"]
    )
    assert {(r.k, r.v) for r in loaded.collect()} == {(1, "a"), (2, "b"), (3, "c")}
    # unload_and_copy returns a local frame
    back = wh.unload_and_copy(
        "SELECT k FROM wh_src_v ORDER BY k", str(tmp_path / "out2")
    )
    assert list(back["k"]) == [1, 2, 3]
    # load_and_copy: local → stage → table
    raw = tmp_path / "raw.csv"
    raw.write_text("k|v\n9|z\n")
    t = wh.load_and_copy(
        str(raw), "lac", "wh_lac", delim="|", copy_options=["IGNOREHEADER 1"]
    )
    assert [(r.k, r.v) for r in t.collect()] == [(9, "z")]


def test_facade_errors(spark):
    from locopy_spark.errors import DBError

    wh = Snowflake(spark=spark)
    wh.connect()
    with pytest.raises(DBError, match="stage_root"):
        wh.upload_to_internal("/tmp/nope.csv")
    with pytest.raises(DBError, match="Unsupported UNLOAD"):
        wh.unload("SELECT 1", "/tmp/x", unload_options=["ENCRYPTED"])
    closed = Warehouse()
    with pytest.raises(DBError):
        closed.copy("t", "/tmp/x")
    with pytest.raises(DBError):
        closed.unload("SELECT 1", "/tmp/x")


def test_unload_option_delimiter_forms():
    from locopy_spark.errors import DBError
    from locopy_spark.warehouse import _parse_unload_options

    # all three Redshift spellings parse to the same delimiter
    assert _parse_unload_options(["DELIMITER '|'"]) == {"delim": "|"}
    assert _parse_unload_options(["DELIMITER |"]) == {"delim": "|"}
    assert _parse_unload_options(["DELIMITER AS ','"]) == {"delim": ","}
    # malformed/unknown raise DBError, never IndexError
    import pytest

    with pytest.raises(DBError):
        _parse_unload_options(["DELIMITER "])
    with pytest.raises(DBError):
        _parse_unload_options(["DELIMITERX '|'"])
