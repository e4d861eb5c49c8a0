"""Golden end-to-end suite test: planted defects → expected per-partition
verdicts + violation rows (SURVEY.md §5 t1, mirroring the reference's
golden tests tests/sample1_test.go). All expected counts are closed-form
from the generator's arithmetic.
"""

import pytest
from pyspark.sql import functions as F

from json_spark.fixtures.gen import (
    CORRUPT_EVERY,
    MISMATCH_EVERY,
    ORPHAN_EVERY,
    generate_clips,
    generate_manifest,
)
from json_spark.plans.suite import SuiteConfig, SuiteResult, ValidationSuite, build_baseline_shares

N = 3000


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clips_fixture"))
    generate_clips(spark, N, partitions=8).write.mode("overwrite") \
        .partitionBy("codec").parquet(f"{d}/clips")
    generate_manifest(spark, N, partitions=4).write.mode("overwrite") \
        .parquet(f"{d}/manifest")
    return d


@pytest.fixture(scope="module")
def result(spark, fixture_dir) -> SuiteResult:
    clips = spark.read.parquet(f"{fixture_dir}/clips")
    manifest = spark.read.parquet(f"{fixture_dir}/manifest")
    cfg = SuiteConfig()
    baseline = build_baseline_shares(clips.filter(F.col("codec") != "opus"), cfg)
    suite = ValidationSuite(cfg)
    return suite.run(spark, clips, manifest, baseline)


def _viols(result, check):
    return result.violations.filter(F.col("check_name") == check).collect()


def test_uniqueness_finds_planted_dups(result):
    # rows 999/1999/2999 reuse the previous row's clip_id → 3 dup keys
    rows = _viols(result, "uniqueness")
    assert len(rows) == 3
    assert {r["clip_id"] for r in rows} == {
        "clip-000000000998", "clip-000000001998", "clip-000000002998"}


def test_referential_finds_planted_orphans(result):
    rows = _viols(result, "referential")
    expected = {f"clip-{i:012d}" for i in range(N)
                if i % ORPHAN_EVERY == ORPHAN_EVERY - 1}
    assert {r["clip_id"] for r in rows} == expected


def test_transcript_finds_planted_mismatches(result):
    rows = _viols(result, "transcript")
    expected = {f"clip-{i:012d}" for i in range(N)
                if i % MISMATCH_EVERY == MISMATCH_EVERY - 1
                and i % ORPHAN_EVERY != ORPHAN_EVERY - 1}
    assert {r["clip_id"] for r in rows} == expected


def test_snr_finds_planted_corruption(result):
    rows = _viols(result, "snr")
    expected = {f"clip-{i:012d}" for i in range(N)
                if i % CORRUPT_EVERY == CORRUPT_EVERY - 1}
    assert {r["clip_id"] for r in rows} == expected
    # every offending value carries the measured (low) SNR
    assert all(r["offending_value_trunc50"].startswith("snr_db=") for r in rows)


def test_drift_flags_only_drifted_codec(result):
    verdicts = {
        r["partition_id"]: r["verdict"]
        for r in result.partition_verdicts.filter(
            F.col("check_name") == "drift_sr_hz").collect()
    }
    assert verdicts["opus"] == "RED"        # planted sr_hz shift
    assert verdicts["pcm_s16le"] == "GREEN"
    assert verdicts["flac"] == "GREEN"
    assert verdicts["mp3"] == "GREEN"
    # dur_ms has no planted drift: every partition GREEN, metrics carry ks
    dur = result.partition_verdicts.filter(
        F.col("check_name") == "drift_dur_ms").collect()
    assert len(dur) == 4
    assert all(r["verdict"] == "GREEN" for r in dur)
    assert all('"ks":' in r["metrics_json"] for r in dur)


def test_stats_green_low_null_rate(result):
    stats = result.partition_verdicts.filter(
        F.col("check_name") == "stats").collect()
    assert len(stats) == 4  # one per codec
    assert all(r["verdict"] == "GREEN" for r in stats)  # ~1% nulls < 5% gate


def test_partition_verdicts_shape(result):
    pv = result.partition_verdicts
    # 8 checks (incl. drift_sr_hz + drift_dur_ms + header) x 4 codec partitions
    assert pv.count() == 32
    assert pv.filter(F.col("n_rows") <= 0).count() == 0


def test_header_check_green_on_fixture(result):
    # fixture WAVs are canonical: container + sample rate always consistent
    hdr = result.partition_verdicts.filter(
        F.col("check_name") == "header").collect()
    assert len(hdr) == 4
    assert all(r["verdict"] == "GREEN" for r in hdr)
    assert all(r["n_red"] == 0 and r["n_yellow"] == 0 for r in hdr)


def test_header_check_flags_planted_defects(spark):
    import numpy as np
    from json_spark.fixtures.signal import pcm16_wav_bytes
    good = pcm16_wav_bytes(np.zeros(800, dtype=np.float32), 8000)
    sr_lie = pcm16_wav_bytes(np.zeros(800, dtype=np.float32), 16000)
    rows = [("ok", bytearray(good), 8000, 100, "wav", "t"),
            ("cut", bytearray(good[:100]), 8000, 100, "wav", "t"),
            ("lie", bytearray(sr_lie), 8000, 100, "wav", "t")]
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")
    verdicts, viols = ValidationSuite(SuiteConfig()).check_header(clips)
    v = verdicts.collect()[0]
    assert v["verdict"] == "RED"               # worst-of: truncated clip
    assert v["n_red"] == 1 and v["n_yellow"] == 1 and v["n_green"] == 1
    got = {r["clip_id"]: r for r in viols.collect()}
    assert set(got) == {"cut", "lie"}
    assert "container" in got["cut"]["reason"]
    assert got["lie"]["offending_value_trunc50"] == "hdr_sr=16000 meta_sr=8000"


def test_ledger_resume(spark, fixture_dir, tmp_path):
    clips = spark.read.parquet(f"{fixture_dir}/clips")
    manifest = spark.read.parquet(f"{fixture_dir}/manifest")
    ledger_path = str(tmp_path / "ledger")
    suite = ValidationSuite(SuiteConfig())

    # first run: only two codecs → ledger has those partitions DONE
    subset = clips.filter(F.col("codec").isin("flac", "mp3"))
    r1 = suite.run(spark, subset, manifest, ledger_path=ledger_path,
                   input_path=fixture_dir)
    assert {x["partition_id"] for x in r1.partition_verdicts.collect()} == {
        "flac", "mp3"}

    # resumed run over the full table must touch ONLY the remaining codecs
    r2 = suite.run(spark, clips, manifest, ledger_path=ledger_path,
                   input_path=fixture_dir, resume=True)
    touched = {x["partition_id"] for x in r2.partition_verdicts.collect()}
    assert touched == {"pcm_s16le", "opus"}

    # third run: everything DONE → empty worklist
    r3 = suite.run(spark, clips, manifest, ledger_path=ledger_path,
                   input_path=fixture_dir, resume=True)
    assert r3.partition_verdicts.count() == 0


# ---------------------------------------------------------------- content


@pytest.fixture(scope="module")
def content_result(spark, fixture_dir) -> SuiteResult:
    clips = spark.read.parquet(f"{fixture_dir}/clips")
    return ValidationSuite(SuiteConfig(content_checks=True)).run(spark, clips)


def test_content_checks_ride_the_media_pass(content_result):
    """content_checks=True adds pcm_content + silence + bandwidth +
    bit_depth + polarity verdict rows per partition, served by the same
    single decode pass as header + snr."""
    names = {r["check_name"] for r in
             content_result.partition_verdicts.select("check_name")
             .distinct().collect()}
    assert {"pcm_content", "silence", "bandwidth", "bit_depth",
            "polarity", "header", "snr"} <= names


def test_pcm_content_matches_standalone_digest(spark, fixture_dir,
                                               content_result):
    """The fused suite's per-partition digest totals equal the standalone
    pcm_digest stage aggregated the same way — one pass, same integers."""
    import json

    from json_spark.operators.snr import pcm_scan
    clips = spark.read.parquet(f"{fixture_dir}/clips")
    # carry codec THROUGH the scan (a clip_id join would fan out on the
    # fixture's planted duplicate ids and double-count)
    standalone = (pcm_scan(clips, extra_cols=["codec"], emit_digest=True)
                  .groupBy("codec")
                  .agg(F.sum("pcm_abs_sum").alias("abs_sum"),
                       F.sum("n_samples").alias("ns")))
    want = {r["codec"]: (r["abs_sum"], r["ns"]) for r in standalone.collect()}
    got = {}
    for r in content_result.partition_verdicts.filter(
            F.col("check_name") == "pcm_content").collect():
        m = json.loads(r["metrics_json"])
        got[r["partition_id"]] = (m["pcm_abs_sum"], m["n_samples"])
    assert got == want


def test_silence_check_yellow_path(spark):
    """A GREEN clip necessarily carries the reference waveform (the SNR
    gate regenerates it from clip_id), so a mostly-silent-yet-GREEN clip
    cannot exist in fixture data; the YELLOW path is exercised by
    lowering the per-clip threshold below the waveform's natural
    near-silence share. A truly silent clip fails the SNR gate → RED."""
    import numpy as np

    from json_spark.fixtures.signal import pcm16_wav_bytes, reference_signal
    loud = reference_signal("clip-loud", 8000, 100)
    quiet = np.zeros(800, dtype=np.float32)  # decodes fine, no signal
    rows = [("clip-loud", bytearray(pcm16_wav_bytes(loud, 8000)),
             8000, 100, "wav", "t"),
            ("clip-quiet", bytearray(pcm16_wav_bytes(quiet, 8000)),
             8000, 100, "wav", "t")]
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")
    # threshold 0 → any near-silent sample trips the clip; the sine
    # waveform crosses zero every half period, so clip-loud goes YELLOW
    # while clip-quiet is RED (unverifiable content, SNR gate)
    res = ValidationSuite(SuiteConfig(
        content_checks=True, max_silence_ratio=0.0)).run(spark, clips)
    sil = res.partition_verdicts.filter(
        F.col("check_name") == "silence").collect()
    assert len(sil) == 1
    assert sil[0]["verdict"] == "RED"        # worst-of: the silent clip
    assert sil[0]["n_red"] == 1 and sil[0]["n_yellow"] == 1
    viol = {r["clip_id"]: r for r in res.violations.filter(
        F.col("check_name") == "silence").collect()}
    assert set(viol) == {"clip-loud"}
    assert viol["clip-loud"]["offending_value_trunc50"].startswith(
        "n_silence=")
    # default threshold (0.5): the same pair yields no silence violation
    res2 = ValidationSuite(SuiteConfig(content_checks=True)).run(spark, clips)
    assert res2.violations.filter(
        F.col("check_name") == "silence").count() == 0


def test_speech_rate_band_edges(spark):
    """Band classification hits every branch: OK, TOO_SLOW (the ms-vs-s
    unit bug signature), TOO_FAST (wrong-clip pairing), UNRATABLE."""
    from json_spark.operators.referential import speech_rate_check
    rows = [
        ("ok",    "twenty chars of text", 1000),   # 20 cps
        ("slow",  "hi",                   60000),  # 0.03 cps
        ("fast",  "x" * 600,              100),    # 6000 cps
        ("nodur", "some text",            None),
        ("notxt", None,                   500),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, transcript string, dur_ms int")
    got = speech_rate_check(df, min_cps=10.0, max_cps=5000.0).collect()[0]
    assert got["n_rows"] == 5
    assert got["n_ok"] == 1
    assert got["n_too_slow"] == 1
    assert got["n_too_fast"] == 1
    assert got["n_unratable"] == 2


def test_join_fanout_profile_exact_and_ties(spark):
    """join_fanout_profile equals the actually-executed join's row count;
    a max-fanout tie resolves to the MINIMUM key; one-sided keys count
    in n_keys_* but not n_keys_both; a hot key flips the verdict RED."""
    from json_spark.operators.referential import join_fanout_profile

    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, 5, 5, 5]], "k long")
    right = spark.createDataFrame(
        [(k,) for k in [1, 1, 2, 2, 2, 4, 5, 5]], "k long")
    row = join_fanout_profile(left, right, "k").collect()[0]
    true_inner = left.join(right, "k").count()
    assert row["inner_rows"] == true_inner == 3 * 2 + 2 * 3 + 3 * 2
    # keys 1 and 5 tie at fanout 6 -> top_key must be the minimum, 1
    assert row["max_key_fanout"] == 6 and row["top_key"] == 1
    assert row["n_keys_left"] == 4 and row["n_keys_right"] == 4
    assert row["n_keys_both"] == 3
    assert row["rows_left"] == 9 and row["rows_right"] == 8
    assert row["verdict"] == "GREEN"

    hot = join_fanout_profile(left, right, "k", max_fanout=5).collect()[0]
    assert hot["verdict"] == "RED"


def test_bandwidth_check_flags_drifted_codec(content_result):
    """The planted upsample story: 'opus' draws sr from {44100, 48000}
    while content tops out at 3·1096 Hz, so every decodable opus clip
    sits below Nyquist/16 → the opus partition's bandwidth verdict is
    YELLOW (or RED if it also holds a planted-noise clip) with
    n_yellow = n_rows − n_red, and violations carry the fixed-point
    occupancy."""
    rows = {r["partition_id"]: r for r in
            content_result.partition_verdicts.filter(
                F.col("check_name") == "bandwidth").collect()}
    opus = rows["opus"]
    assert opus["verdict"] in ("YELLOW", "RED")
    assert opus["n_yellow"] == opus["n_rows"] - opus["n_red"]
    viol = content_result.violations.filter(
        (F.col("check_name") == "bandwidth")
        & (F.col("partition_id") == "opus")).collect()
    assert len(viol) == opus["n_yellow"]
    assert all(v["offending_value_trunc50"].startswith("nhfc_fp=")
               for v in viol)
    import json as _json
    for r in rows.values():
        m = _json.loads(r["metrics_json"])
        assert m["hfc_sum"] >= 0 and m["pcm_sq_sum"] > 0


def test_metadata_checks_family(spark, fixture_dir):
    """cfg.metadata_checks: the cross-field family rides the suite —
    every non-pcm codec column lies about the WAV container (RED) and
    every i%101==100 row has NULL dur against a sound payload (YELLOW);
    expected counts are closed-form from the generator arithmetic."""
    clips = spark.read.parquet(f"{fixture_dir}/clips")
    res = ValidationSuite(SuiteConfig(metadata_checks=True)).run(
        spark, clips)
    v = {(r["partition_id"], r["check_name"]): r
         for r in res.partition_verdicts.collect()
         if r["check_name"].startswith("payload:")}
    assert len(v) == 8                                   # 4 codecs x 2 checks
    assert v[("pcm_s16le", "payload:container_vs_codec")]["verdict"] == "GREEN"
    for codec in ("flac", "opus", "mp3"):
        row = v[(codec, "payload:container_vs_codec")]
        assert row["verdict"] == "RED"
        assert row["n_red"] == row["n_rows"]             # every row lies
    n_null_dur = sum(v[(c, "payload:dur_vs_header")]["n_yellow"]
                     for c in ("pcm_s16le", "flac", "opus", "mp3"))
    assert n_null_dur == sum(1 for i in range(N) if i % 101 == 100)
    viols = res.violations.filter(
        F.col("check_name") == "payload:dur_vs_header").collect()
    assert len(viols) == n_null_dur
    assert all(r["offending_value_trunc50"] == "<null>" for r in viols)
    res.unpersist()


def test_suite_empty_input_degrades_gracefully(spark):
    """A freshly-created (or fully-pruned) table must yield zero verdict
    and violation rows from every check family — no division-by-zero
    verdicts, no exceptions — so a scheduler can run the suite
    unconditionally before data lands."""
    from json_spark.fixtures.gen import CLIPS_SCHEMA
    empty = spark.createDataFrame([], CLIPS_SCHEMA)
    res = ValidationSuite(SuiteConfig(metadata_checks=True,
                                      content_checks=True)).run(spark, empty)
    assert res.partition_verdicts.count() == 0
    assert res.violations.count() == 0
    res.unpersist()


def test_manifest_dangling_reverse_referential(spark, fixture_dir):
    """Reverse referential: manifest rows whose clip never landed are
    exactly the duplicate-id plants (their own id never reaches clips)."""
    from json_spark.operators.referential import dangling_dim_rows
    clips = spark.read.parquet(f"{fixture_dir}/clips")
    manifest = spark.read.parquet(f"{fixture_dir}/manifest")
    got = {r["clip_id"] for r in
           dangling_dim_rows(manifest, clips, "clip_id").collect()}
    want = {f"clip-{i:012d}" for i in range(N)
            if i % 1000 == 999 and i > 0 and i % 991 != 990}
    assert got == want and len(got) == 3


def test_quarantine_full_rows(spark):
    """quarantine() extracts the FULL rows (payload included) of every
    violating clip — both copies of a duplicate pair, the corrupt clip,
    nothing else."""
    from json_spark.fixtures.gen import CORRUPT_EVERY, DUP_EVERY, _row, \
        generate_clips
    from json_spark.plans.suite import SuiteConfig, ValidationSuite, \
        quarantine
    n = 1100
    clips = generate_clips(spark, n, partitions=4)
    res = ValidationSuite(SuiteConfig()).run(spark, clips)
    q = quarantine(clips, res.violations)
    rows = q.collect()
    assert all(r["bytes"] is not None for r in rows)   # full payloads
    want = set()
    for i in range(n):
        if i % CORRUPT_EVERY == CORRUPT_EVERY - 1:
            want.add(_row(i)["clip_id"])
        if i % DUP_EVERY == DUP_EVERY - 1 and i > 0:
            want.add(_row(i)["clip_id"])               # the reused id
    got = {r["clip_id"] for r in rows}
    assert got == want
    # both copies of each dup pair ride along (semi-join is by key)
    dup_ids = {_row(i)["clip_id"] for i in range(n)
               if i % DUP_EVERY == DUP_EVERY - 1 and i > 0}
    for d in dup_ids:
        assert sum(1 for r in rows if r["clip_id"] == d) == 2
    res.unpersist()
