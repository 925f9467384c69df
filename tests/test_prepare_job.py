"""End-to-end test of the training-data preparation job (in-process
main(), same code spark-submit runs)."""

import json

import duckdb

from tests.conftest import SF_DIR


def test_prepare_training_data_funnel(spark, tmp_path, capsys):
    from jobs.prepare_training_data import main

    out = str(tmp_path / "corpus")
    main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--eval-pred", "doc_id % 17 = 0",
        "--mix", "en=1.0", "fr=0.0",
        "--default-rate", "0.5",
        "--min-quality", "0.25",
    ])
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith('{"funnel"')
    ][-1]
    funnel = json.loads(line)["funnel"]
    # monotone funnel, each gate only removes
    order = ["input", "exact_keep", "near_keep", "quality_keep",
             "rep_keep", "decontam_keep", "mix_keep"]
    vals = [funnel[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert funnel["input"] > funnel["mix_keep"] > 0
    kept = duckdb.sql(f"SELECT * FROM '{out}/*.parquet'").df()
    dec = duckdb.sql(f"SELECT * FROM '{out}_decisions/*.parquet'").df()
    assert len(kept) == funnel["mix_keep"] == int(dec["selected"].sum())
    assert len(dec) == funnel["input"]
    # eval-slice rows never reach the corpus
    assert not (kept["doc_id"] % 17 == 0).any()
    # fr rate 0.0: no French rows survive the mix
    assert not (kept["lang"] == "fr").any()
    # en rate 1.0: an en row passing every earlier gate is kept
    en_ok = dec[(dec["lang"] == "en") & dec["exact_keep"] & dec["near_keep"]
                & dec["quality_keep"] & dec["rep_keep"] & dec["decontam_keep"]]
    assert en_ok["selected"].all() and len(en_ok) > 0
