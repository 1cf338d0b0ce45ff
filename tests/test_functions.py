"""Scalar-kernel conformance tests (FIXTURES.md F3 edge cases)."""

import pyarrow as pa
import pytest

from etl_warehouse_agnostic_ray import functions as F


def s(*vals):
    return pa.array(list(vals), pa.string())


class TestDates:
    def test_ms_json_date(self):
        got = F.parse_ms_json_date(
            s(
                "/Date(1665059530000+0000)/",
                "/Date(1665059530000)/",
                "2023-04-06T10:30:00Z",
                "2023-04-06 10:30:00",
                "2023-04-06",
                "garbage",
                "",
                None,
            )
        )
        vals = [v.as_py() for v in got]
        assert str(vals[0]) == "2022-10-06 12:32:10"
        assert vals[0] == vals[1]
        assert str(vals[2]) == "2023-04-06 10:30:00"
        assert str(vals[3]) == "2023-04-06 10:30:00"
        assert str(vals[4]) == "2023-04-06 00:00:00"
        assert vals[5] is None and vals[6] is None and vals[7] is None

    def test_sentinel(self):
        ts = F.parse_ms_json_date(s("/Date(1752532203816)/", "2023-01-01"))
        out = F.sentinel_date_to_null(ts, ["2025-07-14T22:30:03.816000"])
        assert out[0].as_py() is None
        assert out[1].as_py() is not None

    def test_derivations(self):
        ts = F.parse_ms_json_date(s("2023-04-06 10:30:00", "2023-04-08 23:10:00"))
        assert [v.as_py() for v in F.to_hour(ts)] == [10, 23]
        assert [v.as_py() for v in F.to_dow(ts)] == [4, 6]  # Thu, Sat
        assert [v.as_py() for v in F.to_year(ts)] == [2023, 2023]
        assert [v.as_py() for v in F.time_of_day_bucket(ts)] == ["morning", "night"]
        assert F.date_diff_days(ts.slice(0, 1), ts.slice(1, 1))[0].as_py() == 2


class TestStrings:
    def test_trim_nullif(self):
        got = F.trim_nullif(s("  x  ", "", "   ", None, "ok"))
        assert [v.as_py() for v in got] == ["x", None, None, None, "ok"]

    def test_email(self):
        arr = s("A.User@Example.COM", "bad@", "x@y.zz", "", None)
        assert [v.as_py() for v in F.email_valid(arr)] == [True, False, True, False, False]
        assert [v.as_py() for v in F.email_domain(arr)] == [
            "example.com",
            None,
            "y.zz",
            None,
            None,
        ]

    def test_phone(self):
        got = F.phone_normalize_us(s("(555) 123-4567", "15551234567", "555123", None))
        assert [v.as_py() for v in got] == ["5551234567", "5551234567", None, None]

    def test_names(self):
        full = s("Ada Lovelace", "Prince", "  Grace Brewster Hopper ")
        assert [v.as_py() for v in F.first_name(full)] == ["Ada", "Prince", "Grace"]
        assert [v.as_py() for v in F.last_name(full)] == ["Lovelace", None, "Hopper"]

    def test_territory_and_join(self):
        terr = F.split_territory(s("East > NY > NYC", "West"))
        assert terr[0].as_py() == ["East", "NY", "NYC"]
        assert terr[1].as_py() == ["West"]
        assert [v.as_py() for v in F.pipe_join_list(terr)] == ["East|NY|NYC", "West"]

    def test_squash(self):
        got = F.squash_whitespace(s("a\r\nb\t c   d ", None))
        assert got[0].as_py() == "a b c d"

    def test_sanitize(self):
        assert F.sanitize_column_name("My Col.Name-2") == "my_col_name_2"
        assert F.sanitize_column_name("  weird  ") == "weird"


class TestNumeric:
    def test_int_or_null(self):
        got = F.to_int_or_null(s("42", "-7", "3.14", "NULL", "nan", "<NA>", "", "12abc", None))
        assert [v.as_py() for v in got] == [42, -7, None, None, None, None, None, None, None]

    def test_float_or_null(self):
        got = F.to_float_or_null(s("3.14", "-0.5", "1e3", "x", ""))
        assert [v.as_py() for v in got] == [3.14, -0.5, 1000.0, None, None]

    def test_bool(self):
        got = F.parse_bool(s("true", "1", "t", "YES", "false", "0", "no", "None", None))
        assert [v.as_py() for v in got] == [
            True,
            True,
            True,
            True,
            False,
            False,
            False,
            None,
            None,
        ]

    def test_gps(self):
        lat = F.validate_lat(s("40.7", "91", "-91", "0", "abc"))
        assert [v.as_py() for v in lat] == [40.7, None, None, None, None]
        lon = F.validate_lon(s("-74.0", "181", "0"))
        assert [v.as_py() for v in lon] == [-74.0, None, None]

    def test_pct(self):
        got = F.pct_of(pa.array([1.0, 5.0, 1.0]), pa.array([4.0, 0.0, 3.0]))
        assert [v.as_py() for v in got] == [25.0, None, 33.33]

    def test_geo(self):
        d = F.geo_distance_m(
            pa.array([40.7128]), pa.array([-74.006]), pa.array([40.7614]), pa.array([-73.9776])
        )
        assert 5500 < d[0].as_py() < 6500  # ~5.9 km midtown<->downtown


class TestJson:
    def test_extract(self):
        arr = s('{"k": 87, "name": "a b"}', '{"name": "x"}', "not json", None)
        assert [v.as_py() for v in F.json_extract_string(arr, "k")] == ["87", None, None, None]
        assert [v.as_py() for v in F.json_extract_string(arr, "name")] == [
            "a b",
            "x",
            None,
            None,
        ]

    def test_valid(self):
        arr = s('{"a":1}', "[1,2]", "{bad", "", None)
        assert [v.as_py() for v in F.json_valid(arr)] == [True, True, False, False, False]


class TestUrl:
    def test_normalize_url(self):
        import pyarrow as pa

        a = pa.array(
            [
                "HTTPS://EXAMPLE.com/Path/Page?Q=CaseKept#frag",
                "http://WWW.Example.COM:8080/a/b#x",
                "https://user:pw@Sub.Host.ORG/deep?k=v",
                "example.com/no-scheme",
                "",
                None,
            ]
        )
        got = F.normalize_url(a).to_pylist()
        assert got == [
            "https://example.com/Path/Page?Q=CaseKept",  # path case preserved
            "http://www.example.com:8080/a/b",
            "https://user:pw@sub.host.org/deep?k=v",
            "example.com/no-scheme",  # schemeless passes through
            "",
            None,
        ]

    def test_url_host(self):
        import pyarrow as pa

        a = pa.array(
            [
                "HTTPS://EXAMPLE.com/Path",
                "http://WWW.Example.COM:8080/a",
                "https://user:pw@Sub.Host.ORG/deep",
                "example.com/no-scheme",
                None,
            ]
        )
        got = F.url_host(a).to_pylist()
        assert got == ["example.com", "example.com", "sub.host.org", None, None]


class TestHash:
    def test_record_hash_deterministic(self):
        t = pa.table({"a": ["x", "y", None], "b": [1, 2, 3]})
        h1 = F.record_hash64(t, ["a", "b"])
        h2 = F.record_hash64(t, ["a", "b"])
        assert h1.equals(h2)
        assert len(set(h1.to_pylist())) == 3


class TestBusinessKey:
    def test_coalesce_business_key(self):
        from etl_warehouse_agnostic_ray.functions.string_fns import coalesce_business_key

        guid = s("", "  ", "g-1", None)
        nat = s("n-0", "n-1", "n-2", None)
        got = coalesce_business_key(guid, nat)
        assert [v.as_py() for v in got] == ["n-0", "n-1", "g-1", None]
