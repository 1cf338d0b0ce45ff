"""Stage-operator tests: flatten rules, explode+ordinal, lineage stamp,
validation aggregates, dedup guard."""

import pyarrow as pa
import pyarrow.compute as pc

from etl_warehouse_agnostic_ray.stages.bloom import DedupGuard
from etl_warehouse_agnostic_ray.stages.explode import explode_json_array
from etl_warehouse_agnostic_ray.stages.flatten import (
    clean_ragged_rows,
    flatten_array_summary,
    flatten_money,
    flatten_structs,
    unwrap_value_envelopes,
)
from etl_warehouse_agnostic_ray.stages.stamp import bronze_project, stamp_lineage
from etl_warehouse_agnostic_ray.stages.validate import validate_dataset


class TestFlatten:
    def test_structs_and_lists(self):
        t = pa.table(
            {
                "id": [1, 2],
                "a": pa.array([{"b": {"c": 5}}, {"b": {"c": 7}}]),
                "tags": pa.array([["x", "y"], None]),
            }
        )
        out = flatten_structs(t)
        assert out.column_names == ["id", "a_b_c", "tags"]
        assert out.column("a_b_c").to_pylist() == [5, 7]
        assert out.column("tags").to_pylist() == ['["x", "y"]', None]

    def test_money(self):
        t = pa.table(
            {"id": [1], "total": pa.array([{"amount": "9.99", "currency": "USD"}])}
        )
        out = flatten_money(t, "total")
        assert out.column("total_amount").to_pylist() == [9.99]
        assert out.column("total_currency").to_pylist() == ["USD"]

    def test_array_summary(self):
        t = pa.table(
            {
                "id": [1, 2],
                "items": pa.array(
                    [[{"sku": "a"}, {"sku": "b"}], None],
                    pa.list_(pa.struct([("sku", pa.string())])),
                ),
            }
        )
        out = flatten_array_summary(t, "items", primary_field="sku")
        assert out.column("items_count").to_pylist() == [2, 0]
        assert out.column("items_primary_sku").to_pylist() == ["a", None]
        assert '"sku": "a"' in out.column("items_json").to_pylist()[0]

    def test_value_envelope(self):
        t = pa.table({"Name": pa.array([{"value": "Acme"}, {"value": None}])})
        out = unwrap_value_envelopes(t)
        assert out.column("Name").to_pylist() == ["Acme", None]

    def test_ragged_sheet(self):
        rows = [
            ["Name", "Amount", "Name", ""],
            ["a", "1"],
            ["", "", "", ""],
            ["b", "2", "x", "ignored-col-empty-header-has-data"],
        ]
        out = clean_ragged_rows(rows)
        assert "name" in out.column_names and "name_1" in out.column_names
        assert out.column("_row_number").to_pylist() == [1, 3]  # empty row dropped
        assert out.column("name").to_pylist() == ["a", "b"]
        assert out.column("amount").to_pylist() == ["1", "2"]


class TestExplode:
    def test_explode_ordinal(self):
        t = pa.table(
            {
                "form_id": ["f1", "f2", "f3", "f4"],
                "items": [
                    '[{"Field":"x","Value":"1"},{"Field":"y","Value":"2"}]',
                    "[]",
                    "not json",
                    None,
                ],
            }
        )
        out = explode_json_array(t, "items", ["Field", "Value"], ["form_id"])
        assert out.column("form_id").to_pylist() == ["f1", "f1"]
        assert out.column("item_number").to_pylist() == [1, 2]
        assert out.column("item_field").to_pylist() == ["x", "y"]
        assert out.column("item_value").to_pylist() == ["1", "2"]


class TestStamp:
    def test_lineage(self):
        t = pa.table({"a": [1, 2]})
        out = stamp_lineage(t, "b-1", 1_700_000_000_000_000, source="repsly")
        assert out.column("_batch_id").to_pylist() == ["b-1", "b-1"]
        assert out.column("_source_system").to_pylist() == ["repsly", "repsly"]
        assert str(out.column("_ingest_ts").type) == "timestamp[us]"

    def test_bronze_project(self):
        t = pa.table({"ApiField": ["v"], "Other Col": ["w"]})
        out = bronze_project(t, mapping={"ApiField": "api_field", "Other Col": "other_col"},
                             hash_cols=["api_field"])
        assert set(out.column_names) == {"api_field", "other_col", "record_hash"}


class TestValidate:
    def test_report(self, ray_session):
        import ray.data as rd

        t = pa.table(
            {
                "url": ["a", "b", "b", "c"],
                "text": ["x", None, None, "y"],
                "warc_ts": pa.array([1, 2, 3, 4], pa.int64()).cast(pa.timestamp("us")),
            }
        )
        rep = validate_dataset(
            rd.from_arrow(t), key="url", critical=["text"], fresh_col="warc_ts", fresh_after_us=3
        )
        assert rep["rows"] == 4
        assert rep["duplicate_keys"] == 1 and rep["duplicate_rows"] == 1
        assert rep["null_rates"]["text"] == 0.5
        assert rep["fresh_rows"] == 2
        assert not rep["passed"]  # 50% null rate + dup key


class TestDedupGuard:
    def _batch(self, lsns):
        return pa.table({"lsn": pa.array(lsns, pa.int64()), "v": [str(x) for x in lsns]})

    def test_hwm_and_in_batch_dup(self):
        g = DedupGuard(applied_lsn=10)
        out = g(self._batch([5, 11, 12, 12, 13]))
        assert out.column("lsn").to_pylist() == [11, 12, 13]

    def test_cross_batch_dup_within_actor(self):
        g = DedupGuard(applied_lsn=-1)
        g(self._batch([1, 2]))
        out = g(self._batch([2, 3]))
        assert out.column("lsn").to_pylist() == [3]

    def test_bloom_mode_sheds(self):
        g = DedupGuard(applied_lsn=-1, use_bloom=True)
        g(self._batch(list(range(100))))
        g.recent.clear()  # simulate exact-set eviction; bloom still catches
        out = g(self._batch([50, 1000]))
        assert out.column("lsn").to_pylist() == [1000]
