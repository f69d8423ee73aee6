"""Resumable partitioned output: a failed run skips finished partitions on
re-run, torn attempts are overwritten, and the committed union round-trips."""

import numpy as np
import pytest

from cloud_crawler_ray.sources.output import read_partitioned, resumable_write

SF = "/root/testdata/sf0.001"
LANGS = ["de", "en", "es", "fr", "zh"]


def _lang_ds(lang):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).filter(
        lambda r: r["lang"] == lang
    )


class TestResumableWrite:
    def test_crash_then_resume_completes_without_rewriting(self, ray_session, tmp_path):
        out = str(tmp_path / "out")

        calls = []

        def flaky(lang):
            calls.append(lang)
            if lang == "fr":
                raise RuntimeError("simulated mid-job crash")
            return _lang_ds(lang)

        with pytest.raises(RuntimeError):
            resumable_write(flaky, out, LANGS)
        first = set(calls)
        assert "fr" in first and "zh" not in first  # died at fr, zh never ran

        calls.clear()
        res = resumable_write(_lang_ds, out, LANGS)
        # the resume ran ONLY the unfinished partitions
        assert sorted(res["skipped"]) == sorted(first - {"fr"})
        assert sorted(res["written"]) == sorted(set(LANGS) - first | {"fr"})

        got = read_partitioned(out).to_pandas()
        assert (got["part"] == got["lang"]).all()  # hive part column inferred
        got = got[["doc_id", "lang"]]
        import pyarrow.parquet as pq

        want = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want)

    def test_torn_partition_without_marker_is_rewritten(self, ray_session, tmp_path):
        import os

        out = str(tmp_path / "out")
        resumable_write(_lang_ds, out, ["en"])
        # simulate a torn attempt: drop the marker, corrupt the data dir
        os.remove(os.path.join(out, "part=en", "_SUCCESS"))
        with open(os.path.join(out, "part=en", "garbage.parquet"), "w") as f:
            f.write("not parquet")
        res = resumable_write(_lang_ds, out, ["en"])
        assert res["written"] == ["en"]
        n = read_partitioned(out).count()
        import duckdb

        want = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet') WHERE lang='en'"
        ).fetchone()[0]
        assert n == want

    def test_read_requires_a_committed_partition(self, ray_session, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_partitioned(str(tmp_path / "empty"))

    def test_curation_flagship_kill_resume_equals_uninterrupted(self, ray_session, tmp_path):
        """The composed curation flagship written through the resumable sink
        (bench.py --curate path): a run killed mid-write and then resumed
        with a fresh writer (pipeline recomputed, finished buckets skipped)
        must produce output identical to an uninterrupted run — and to the
        pipeline's direct result."""
        from cloud_crawler_ray import queries as q

        buckets = 8
        out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")

        make_ds, curated = q.curation_bucket_writer(SF, buckets)
        resumable_write(make_ds, out_a, range(buckets))

        make_ds2, _ = q.curation_bucket_writer(SF, buckets)

        def flaky(b):
            if int(b) == 3:
                raise RuntimeError("simulated mid-job kill")
            return make_ds2(b)

        with pytest.raises(RuntimeError):
            resumable_write(flaky, out_b, range(buckets))
        make_ds3, _ = q.curation_bucket_writer(SF, buckets)
        res = resumable_write(make_ds3, out_b, range(buckets))
        assert sorted(res["skipped"]) == [0, 1, 2]
        assert sorted(res["written"]) == [3, 4, 5, 6, 7]

        cols = ["doc_id", "lang", "n_tokens", "split"]

        def norm(df):
            return df[cols].sort_values("doc_id").reset_index(drop=True)

        a = norm(read_partitioned(out_a).to_pandas())
        b = norm(read_partitioned(out_b).to_pandas())
        direct = norm(curated.to_pandas())
        assert a.equals(b)
        assert a.equals(direct)

    @pytest.mark.parametrize("bad", ["a/b", "a=b", "", "a b", "a\nb", ".."])
    def test_path_significant_partition_values_rejected(self, tmp_path, bad):
        """ADVICE r3: a '/' or '=' in a partition value would silently change
        the directory layout and break the marker/commit discipline."""
        with pytest.raises(ValueError, match="not path-safe"):
            resumable_write(_lang_ds, str(tmp_path / "out"), [bad])


class TestJsonlFormat:
    def test_jsonl_round_trip_with_marker_skip(self, ray_session, tmp_path):
        """jsonl shards carry the identical marker discipline: a second run
        skips every committed partition, and the committed union round-trips
        through read_partitioned(file_format='jsonl')."""
        import pyarrow.parquet as pq

        out = str(tmp_path / "out")
        res1 = resumable_write(_lang_ds, out, LANGS, file_format="jsonl")
        assert sorted(res1["written"]) == sorted(LANGS)
        res2 = resumable_write(_lang_ds, out, LANGS, file_format="jsonl")
        assert sorted(res2["skipped"]) == sorted(LANGS) and not res2["written"]

        got = read_partitioned(out, file_format="jsonl").to_pandas()[["doc_id", "lang"]]
        want = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        assert got.equals(want)

    def test_unknown_format_rejected(self, ray_session, tmp_path):
        with pytest.raises(ValueError, match="file_format"):
            resumable_write(_lang_ds, str(tmp_path / "o"), ["en"], file_format="csv")

    def test_mixed_format_resume_and_read_fail_loudly(self, ray_session, tmp_path):
        """The _SUCCESS marker records the shard format: resuming or reading
        a committed partition with a DIFFERENT format raises instead of
        silently skipping (resume) or dropping (read) committed shards."""
        out = str(tmp_path / "out")
        resumable_write(_lang_ds, out, ["en"], file_format="parquet")
        with pytest.raises(ValueError, match="committed as 'parquet'"):
            resumable_write(_lang_ds, out, ["en", "de"], file_format="jsonl")
        with pytest.raises(ValueError, match="committed as 'parquet'"):
            read_partitioned(out, file_format="jsonl")
