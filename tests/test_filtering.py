"""k-core filtering + RecBole export tests (`/root/reference/README.md:3-13`)."""

import numpy as np
import pandas as pd
import pytest

from furusato_recommend_tpu.preprocessing import (
    five_core,
    k_core,
    read_recbole,
    ten_core,
    write_recbole,
)


def _interactions(rng, n_users=40, n_items=25, n=600):
    return pd.DataFrame(
        {
            "customer_id": rng.integers(0, n_users, n),
            "remap_id": rng.integers(0, n_items, n) ** 2 % n_items,  # skewed
        }
    )


def _reference_five_core(df):
    # verbatim transcription of the README snippet, as the oracle
    df = df[df["remap_id"].isin(df["remap_id"].value_counts()[df["remap_id"].value_counts() >= 5].index)]
    df = df[df["customer_id"].isin(df["customer_id"].value_counts()[df["customer_id"].value_counts() >= 5].index)]
    return df


def test_five_core_matches_reference_snippet():
    df = _interactions(np.random.default_rng(0))
    got = five_core(df)
    want = _reference_five_core(df)
    pd.testing.assert_frame_equal(got, want)


def test_ten_core_single_pass_semantics():
    df = _interactions(np.random.default_rng(1), n=1200)
    got = ten_core(df)
    # single pass: every surviving ITEM had >=10 before the user filter;
    # users surviving have >=10 in the item-filtered frame
    assert (got["customer_id"].value_counts() >= 10).all()
    assert len(got) <= len(df)


def test_k_core_iterate_reaches_fixpoint():
    df = _interactions(np.random.default_rng(2), n=400)
    got = k_core(df, 4, iterate=True)
    if len(got):
        assert (got["customer_id"].value_counts() >= 4).all()
        assert (got["remap_id"].value_counts() >= 4).all()
    # idempotent
    again = k_core(got, 4, iterate=True)
    pd.testing.assert_frame_equal(again, got)


def test_k_core_k1_is_identity():
    df = _interactions(np.random.default_rng(3), n=50)
    pd.testing.assert_frame_equal(k_core(df, 1), df)


def test_write_recbole_roundtrip(tmp_path):
    inter = pd.DataFrame(
        {
            "customer_id": [0, 1, 1, 2],
            "remap_id": [5, 5, 6, 7],
            "rating": [1.0, 0.5, 1.0, 1.0],
        }
    )
    users = pd.DataFrame({"customer_id": [0, 1, 2], "age": [30.0, 41.0, 25.0]})
    items = pd.DataFrame(
        {
            "remap_id": [5, 6, 7],
            "name": ["a", "b", "c"],
            "tags": [["x", "y"], ["y"], []],
        }
    )
    written = write_recbole(
        str(tmp_path), "toy", inter, users=users, items=items,
        extra_inter_cols=("rating",),
    )
    assert set(written) == {"inter", "user", "item"}

    got_inter = read_recbole(written["inter"])
    assert got_inter.attrs["recbole_types"] == {
        "user_id": "token", "item_id": "token", "rating": "float",
    }
    assert got_inter["user_id"].tolist() == [0, 1, 1, 2]
    assert got_inter["rating"].tolist() == [1.0, 0.5, 1.0, 1.0]

    got_user = read_recbole(written["user"])
    assert got_user.attrs["recbole_types"]["age"] == "float"

    got_item = read_recbole(written["item"])
    assert got_item.attrs["recbole_types"]["tags"] == "token_seq"
    assert got_item["tags"].tolist()[0] == "x y"
    # empty sequence roundtrips to the empty string, not NaN (advisor finding)
    assert got_item["tags"].tolist()[2] == ""


def test_write_recbole_per_table_types(tmp_path):
    """Namespaced 'table.col' type keys let a shared column name (timestamp in
    both .inter and .user) take different types per table."""
    inter = pd.DataFrame(
        {"customer_id": [0, 1], "remap_id": [5, 6], "timestamp": [100, 200]}
    )
    users = pd.DataFrame({"customer_id": [0, 1], "timestamp": [7, 8]})
    written = write_recbole(
        str(tmp_path), "ns", inter, users=users,
        extra_inter_cols=("timestamp",),
        types={"inter.timestamp": "float", "user.timestamp": "token"},
    )
    assert read_recbole(written["inter"]).attrs["recbole_types"]["timestamp"] == "float"
    assert read_recbole(written["user"]).attrs["recbole_types"]["timestamp"] == "token"


def test_convert_recbole_cli_extra_cols(tmp_path, capsys):
    from furusato_recommend_tpu.tools import main

    df = pd.DataFrame(
        {
            "customer_id": [0, 1, 1],
            "remap_id": [5, 5, 6],
            "rating": [1.0, 0.5, 1.0],
            "note": ["a", "b", "c"],
        }
    )
    src = tmp_path / "inter.csv"
    df.to_csv(src, index=False)
    main([
        "convert-recbole", "--interactions", str(src), "--out", str(tmp_path),
        "--name", "xc", "--extra_inter_cols", "rating",
        "--types", "rating=float",
    ])
    out = capsys.readouterr().out
    assert "dropping interaction columns ['note']" in out
    got = read_recbole(str(tmp_path / "xc.inter"))
    assert got.attrs["recbole_types"]["rating"] == "float"
    assert got["rating"].tolist() == [1.0, 0.5, 1.0]
    assert "note" not in got.columns


def test_convert_recbole_cli(tmp_path, capsys):
    from furusato_recommend_tpu.tools import main

    df = _interactions(np.random.default_rng(4), n=800)
    src = tmp_path / "inter.csv"
    df.to_csv(src, index=False)
    main([
        "convert-recbole", "--interactions", str(src), "--out", str(tmp_path),
        "--name", "cli", "--k_core", "5",
    ])
    out = capsys.readouterr().out
    assert "k_core(5)" in out
    got = read_recbole(str(tmp_path / "cli.inter"))
    want = five_core(df)
    assert len(got) == len(want)
