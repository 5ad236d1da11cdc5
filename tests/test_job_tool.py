"""Job/Args/Tool harness tests (ArgTest.scala, Tool.scala behaviors)."""

import pytest

from scalding_spark.job import Args, CascadeJob, Job, ScriptJob
from scalding_spark.tool import load_job_class, run


def test_args_parsing():
    a = Args(["--input", "/x", "--n", "1", "2", "--flag"])
    assert a("input") == "/x"
    assert a.list("n") == ["1", "2"]
    assert a.boolean("flag") and not a.boolean("nope")
    assert a.getOrElse("missing", "d") == "d"
    with pytest.raises(KeyError):
        a.required("missing")
    with pytest.raises(ValueError):
        a.optional("n")


def test_job_next_chaining(spark):
    runs = []

    class Second(Job):
        def build(self):
            runs.append("second")

    class First(Job):
        def build(self):
            runs.append("first")

        def next(self):
            return Second(self.args, self.spark)

    First.run_all([], spark)
    assert runs == ["first", "second"]


def test_cascade_and_script_jobs(spark, tmp_path):
    marker = tmp_path / "touched"

    class A(Job):
        def build(self):
            pass

    class Casc(CascadeJob):
        def jobs(self):
            return [A(self.args, self.spark)]

    assert Casc.run_all([], spark) is None  # no raise == success

    class Sh(ScriptJob):
        def scripts(self):
            return [["touch", str(marker)]]

    Sh(Args([]), spark).run()
    assert marker.exists()


def test_tool_load_and_error_paths():
    cls = load_job_class("examples.wordcount_job.WordCountJob")
    assert issubclass(cls, Job)
    with pytest.raises(SystemExit):
        load_job_class("NotDotted")
    with pytest.raises(SystemExit):
        load_job_class("scalding_spark.job.Args")  # not a Job
    assert run([]) == 2


def test_prepare_training_data_job_end_to_end(spark, tmp_path):
    """The full north-star pipeline runs at sf0.001 and yields disjoint,
    covering, deduplicated splits."""
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    out = str(tmp_path / "corpus")
    job = PrepareTrainingDataJob(
        Args(["--input", "/root/testdata/sf0.001/documents.parquet",
              "--output", out, "--min-quality", "0.0",
              "--min-model-score", "0.0", "--max-neg-logp", "99",
              "--jaccard", "0.5", "--mix-budget-chars", "20000",
              "--pack-tokens", "256"]), spark)
    job.run()
    got = spark.read.parquet(out)
    # packed-sequence sidecar: budget respected up to one-doc overrun
    seqs = spark.read.parquet(out + "_train_sequences")
    assert {"seq_id", "text", "n_docs", "n_tokens"} <= set(seqs.columns)
    assert seqs.count() > 0
    # span-audit sidecar exists with the contract schema (may be empty)
    spans = spark.read.parquet(out + "_shared_spans")
    assert set(spans.columns) == {"id_a", "id_b", "start_a", "start_b",
                                  "span_tokens"}
    n_in = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").count()
    n_out = got.count()
    assert 0 < n_out <= n_in
    assert set(r["split"] for r in got.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    # canonical docs only: every kept doc is its own cluster representative,
    # so re-clustering the output at the same threshold finds no duplicates
    assert got.select("doc_id").distinct().count() == n_out


def test_prepare_training_data_job_dsir_stage(spark, tmp_path):
    """--dsir-target caps the corpus at --dsir-k target-like docs before
    clustering; downstream stages still run."""
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    src = "/root/testdata/sf0.001/documents.parquet"
    tgt = str(tmp_path / "target")
    spark.read.parquet(src).where("source = 'src0'").write.parquet(tgt)
    out = str(tmp_path / "corpus_dsir")
    PrepareTrainingDataJob(
        Args(["--input", src, "--output", out, "--min-quality", "0.0",
              "--min-model-score", "0.0", "--dsir-target", tgt,
              "--dsir-k", "30", "--jaccard", "0.5"]), spark).run()
    got = spark.read.parquet(out)
    assert 0 < got.count() <= 30


def _dup_corpus(spark, tmp_path):
    """50 docs: 40 distinct + exact copies of the first 10 (known
    near-dup clusters at any Jaccard threshold)."""
    rows = []
    for i in range(40):
        t = f"document body number {i} sharing many common filler tokens"
        rows.append((i, t, "en", "srcA", len(t)))
    for i in range(10):
        t = f"document body number {i} sharing many common filler tokens"
        rows.append((100 + i, t, "en", "srcB", len(t)))
    src = str(tmp_path / "dup_src")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(src)
    return src


def test_prepare_training_data_job_keep_dups_splits_by_cluster(
        spark, tmp_path):
    """--keep-near-dups retains the duplicate distribution and switches
    the split key to the dedup cluster: every near-dup pair lands in ONE
    split, and a --prev-corpus rerun publishes an all-unchanged diff."""
    import pyspark.sql.functions as F
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    from scalding_spark.functions import dedup
    src = _dup_corpus(spark, tmp_path)
    out1 = str(tmp_path / "run1")
    base = ["--input", src, "--min-quality", "0.0",
            "--min-model-score", "0.0", "--jaccard", "0.5",
            "--keep-near-dups"]
    PrepareTrainingDataJob(Args(base + ["--output", out1]), spark).run()
    got = spark.read.parquet(out1)
    assert got.count() == 50  # duplicates retained, not canonicalized
    pairs = dedup.ngram_jaccard_pairs(got, "text", "doc_id",
                                      n=3, threshold=0.5)
    cl = dedup.dedup_clusters(got.select("doc_id", "text"), pairs,
                              "doc_id")
    per = (got.select("doc_id", "split").join(cl, "doc_id")
           .groupBy("cluster_id")
           .agg(F.countDistinct("split").alias("ns"),
                F.count(F.lit(1)).alias("n")))
    assert per.where("ns > 1").count() == 0          # never straddles
    assert per.where("n > 1").count() >= 10          # dups really exist
    out2 = str(tmp_path / "run2")
    PrepareTrainingDataJob(
        Args(base + ["--output", out2, "--prev-corpus", out1]),
        spark).run()
    statuses = {r["status"] for r in
                spark.read.parquet(out2 + "_diff").collect()}
    assert statuses == {"unchanged"}  # same input, same deterministic run


def test_prepare_training_data_job_decontaminates(spark, tmp_path):
    """--benchmark drops the corpus doc that verbatim-contains an
    eval-set passage; everything else flows through."""
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    src = _dup_corpus(spark, tmp_path)
    leak = "document body number 7 sharing many common filler tokens"
    bench = str(tmp_path / "bench")
    spark.createDataFrame([(0, leak)], "q long, text string") \
        .write.parquet(bench)
    out = str(tmp_path / "decontam_out")
    PrepareTrainingDataJob(
        Args(["--input", src, "--output", out, "--min-quality", "0.0",
              "--min-model-score", "0.0", "--jaccard", "0.5",
              "--benchmark", bench]), spark).run()
    kept = {r["doc_id"] for r in
            spark.read.parquet(out).select("doc_id").collect()}
    assert 7 not in kept and 107 not in kept  # the leak and its exact dup
    assert 8 in kept or 108 in kept           # unrelated docs survive
    # and the per-item leak report sidecar: the benchmark item matched
    # the leaking doc AND its exact duplicate (pre-drop counts)
    rep = {r["bench_id"]: r["n_corpus_docs"] for r in
           spark.read.parquet(out + "_contamination").collect()}
    assert rep[0] >= 2


def test_prepare_training_data_job_url_dedup(spark, tmp_path):
    """--canonicalize-urls collapses click-variant URLs to one doc before
    text processing; unparseable/NULL URLs are all kept."""
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    rows = [
        (1, "alpha article about spark partitions and shuffles",
         "https://Example.com/page?utm_source=x&id=1"),
        (2, "beta article describing catalyst optimizer rules",
         "HTTPS://example.com:443/page?id=1#frag"),   # same canonical as 1
        (3, "gamma piece on broadcast joins and skew salting",
         "https://other.example.org/a"),
        (4, "delta notes covering watermarking in streams", None),
        (5, "epsilon text listing parquet row group sizing", "not a url"),
    ]
    src = str(tmp_path / "url_src")
    spark.createDataFrame(
        [(i, t, "en", "srcA", len(t), u) for i, t, u in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, url string").write.parquet(src)
    out = str(tmp_path / "url_out")
    PrepareTrainingDataJob(
        Args(["--input", src, "--output", out, "--min-quality", "0.0",
              "--min-model-score", "0.0", "--jaccard", "0.5",
              "--canonicalize-urls"]), spark).run()
    kept = {r["doc_id"] for r in
            spark.read.parquet(out).select("doc_id").collect()}
    assert kept == {1, 3, 4, 5}  # 2 collapsed into 1; NULLs all kept


def test_prepare_training_data_job_all_options_compose(spark, tmp_path):
    """Every optional stage enabled at once — the composition surface no
    single-option test exercises (this run caught the cross-stage salt
    correlation that emptied val/test). Asserts all three splits appear
    and every sidecar lands."""
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    # 600 distinct docs + 60 exact dups: enough surviving split KEYS that
    # "all rows in one split" is statistically impossible (0.9^~500)
    rows = []
    for i in range(600):
        t = (f"record {i} holds words w{i % 7} w{i % 11} w{i % 13} "
             f"plus shared filler tokens for the corpus")
        rows.append((i, t, "en", f"src{i % 3}", len(t)))
    for i in range(60):
        t = (f"record {i} holds words w{i % 7} w{i % 11} w{i % 13} "
             f"plus shared filler tokens for the corpus")
        rows.append((1000 + i, t, "en", "srcB", len(t)))
    src = str(tmp_path / "ao_src")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(src)
    bench = str(tmp_path / "ao_bench")
    spark.createDataFrame(
        [(0, rows[3][1])], "q long, text string").write.parquet(bench)
    out = str(tmp_path / "ao_out")
    PrepareTrainingDataJob(
        Args(["--input", src, "--output", out, "--min-quality", "0.0",
              "--min-model-score", "0.0", "--max-neg-logp", "99",
              "--ccnet-keep", "head,middle,tail", "--benchmark", bench,
              "--jaccard", "0.6", "--keep-near-dups",
              "--keep-fraction", "0.9", "--mix-budget-chars", "40000",
              "--pack-tokens", "64", "--drift-report"]), spark).run()
    got = spark.read.parquet(out)
    n = got.count()
    assert 0 < n < 660  # gates and sampling really cut
    kept_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert 3 not in kept_ids and 1003 not in kept_ids  # decontaminated
    splits = {r["split"] for r in got.select("split").distinct().collect()}
    assert splits == {"train", "val", "test"}, splits  # salt hygiene
    assert spark.read.parquet(out + "_train_sequences").count() > 0
    assert spark.read.parquet(out + "_drift").count() == 1
    spark.read.parquet(out + "_shared_spans")  # exists (may be empty)


# --- JobTest harness (round 2: reference JobTest.scala:38-150 parity) ------

def _jobtest_imports():
    from pyspark.sql import functions as F
    from scalding_spark.pipe import Pipe
    from scalding_spark.testing import JobTest
    return F, Pipe, JobTest


def test_jobtest_map_to_group_by_size_sum_max(spark):
    """Port of the reference golden test MapToGroupBySizeSumMaxTest
    (CoreTest.scala:109-156): mapTo (x > 0.5, x) -> groupBy(kx){size,
    sum, max}, with mocked TextLine source and Tsv sink callback."""
    import random
    F, Pipe, JobTest = _jobtest_imports()

    class MapToGroupBySizeSumMaxJob(Job):
        def build(self):
            lines = self.source(self.args("input"))
            x = F.col("line").cast("double")
            out = (Pipe(lines)
                   .map_to(kx=x > 0.5, x=x)
                   .group_by("kx").size("size").sum("x", "sx").max("x")
                   .done())
            self.sink(self.args("output"), out.df)

    rng = random.Random(8)
    inputs = [(str(rng.random()),) for _ in range(101)]
    golden = {}
    for (line,) in inputs:
        xv = float(line)
        k = xv > 0.5
        sz, sm, mx = golden.get(k, (0, 0.0, float("-inf")))
        golden[k] = (sz + 1, sm + xv, max(mx, xv))

    captured = {}

    def check(rows):
        captured.update({r.kx: (r.size, r.sx, r.max_x) for r in rows})

    (JobTest(MapToGroupBySizeSumMaxJob)
     .arg("input", "fakeInput")
     .arg("output", "fakeOutput")
     .source("fakeInput", inputs, "line string")
     .sink("fakeOutput", check)
     .run(spark)
     .finish())

    assert set(captured) == set(golden)
    for k, (sz, sm, mx) in golden.items():
        gsz, gsm, gmx = captured[k]
        assert gsz == sz and gmx == pytest.approx(mx)
        assert gsm == pytest.approx(sm)


def test_jobtest_sink_feeds_next_job_source(spark):
    """A sink written by job 1 is readable as a source by the next() job —
    JobTest.scala:70-72 buffer-sharing semantics."""
    F, Pipe, JobTest = _jobtest_imports()

    class Second(Job):
        def build(self):
            mid = self.source("intermediate")
            self.sink("final", mid.withColumn("v", F.col("v") * 10))

    class First(Job):
        def build(self):
            raw = self.source("raw")
            self.sink("intermediate", raw.withColumn("v", F.col("v") + 1))

        def next(self):
            return Second(self.args, self.spark)

    got = []
    (JobTest(First)
     .source("raw", [(1,), (2,)], "v long")
     .sink("final", lambda rows: got.extend(sorted(r.v for r in rows)))
     .run(spark))
    assert got == [20, 30]


def test_jobtest_unmocked_source_raises(spark):
    _, _, JobTest = _jobtest_imports()

    class J(Job):
        def build(self):
            self.source("nope")

    with pytest.raises(KeyError, match="not mocked"):
        JobTest(J).run(spark)


def test_jobtest_register_file(spark):
    _, _, JobTest = _jobtest_imports()
    seen = {}

    class J(Job):
        def build(self):
            seen["there"] = self.file_exists("/fake/marker")
            seen["absent"] = self.file_exists("/fake/other")

    JobTest(J).register_file("/fake/marker").run(spark)
    assert seen == {"there": True, "absent": False}


def test_production_mode_uses_readers_and_writers(spark, tmp_path):
    """Outside JobTest the same job runs its real readers/writers."""
    F, Pipe, _ = _jobtest_imports()
    src = tmp_path / "in.parquet"
    dst = tmp_path / "out.parquet"
    spark.createDataFrame([(5,)], "v long").write.parquet(str(src))

    class J(Job):
        def build(self):
            df = self.source("in", lambda s: s.read.parquet(str(src)))
            self.sink("out", df.withColumn("v", F.col("v") * 2),
                      lambda d: d.write.parquet(str(dst)))

    J(Args([]), spark).run()
    assert [r.v for r in spark.read.parquet(str(dst)).collect()] == [10]


# --- RangedArgs (round 2: scalding-args RangedArgs.scala:23-58) ------------

def test_range_endpoints_and_misorder():
    from scalding_spark.job import Range
    r = Range(4, 5)
    assert (r.lower, r.upper) == (4, 5)
    Range(4, 4)  # trivial range allowed
    with pytest.raises(AssertionError):
        Range(5, 4)


def test_range_bound_assertions():
    from scalding_spark.job import Range
    r = Range(4, 5)
    r.assert_lower_bound(3)
    r.assert_lower_bound(4)
    with pytest.raises(AssertionError):
        r.assert_lower_bound(5)
    r.assert_upper_bound(6)
    r.assert_upper_bound(5)
    with pytest.raises(AssertionError):
        r.assert_upper_bound(4)
    r.assert_bounds(4, 5)
    with pytest.raises(AssertionError):
        r.assert_bounds(5, 6)


def test_range_mk_string():
    from scalding_spark.job import Range
    assert Range(4, 4).mk_string("_") == "4"
    assert Range(4, 5).mk_string("_") == "4_5"
    assert Range(4, 5).mk_string("-") == "4-5"


def test_args_range_parsing():
    from scalding_spark.job import Range
    a = Args(["--date", "2026-01-01", "2026-01-31", "--n", "7",
              "--bad", "1", "2", "3"])
    assert a.range("date") == Range("2026-01-01", "2026-01-31")
    assert a.range("n", int) == Range(7, 7)
    with pytest.raises(ValueError, match="either 1 or 2"):
        a.range("bad")
    with pytest.raises(ValueError, match="either 1 or 2"):
        a.range("missing")


# -- Job.timeout + flow listeners (Job.scala:163-218) -----------------------

def test_timeout_returns_result_within_deadline():
    job = _make_noop_job()
    assert job.timeout(5.0, lambda: 42) == 42


def test_timeout_returns_none_past_deadline():
    import time
    job = _make_noop_job()
    assert job.timeout(0.1, lambda: time.sleep(5) or "late") is None


def test_timeout_propagates_exceptions():
    job = _make_noop_job()
    with pytest.raises(ValueError, match="boom"):
        job.timeout(5.0, _raise_value_error)


def _raise_value_error():
    raise ValueError("boom")


def _make_noop_job(listeners=None, fail=False):
    from scalding_spark.job import FlowListener  # noqa: F401

    class Noop(Job):
        def __init__(self):
            self.args = Args([])
            self.mode = None
            self.spark = None  # never touched by these tests

        def run(self):
            if fail:
                raise RuntimeError("flow blew up")
            return True

        def listeners(self):
            return listeners or []

    return Noop()


def test_listeners_fire_in_lifecycle_order():
    from scalding_spark.job import FlowListener

    events = []

    class Rec(FlowListener):
        def on_starting(self, job):
            events.append("starting")

        def on_completed(self, job, success):
            events.append(("completed", success))

    assert _make_noop_job(listeners=[Rec()]).execute() is True
    assert events == ["starting", ("completed", True)]


def test_listener_on_throwable_unhandled_reraises():
    from scalding_spark.job import FlowListener

    seen = []

    class Watch(FlowListener):
        def on_throwable(self, job, exc):
            seen.append(type(exc).__name__)
            return False  # not handled -> must re-raise

    with pytest.raises(RuntimeError, match="flew|blew"):
        _make_noop_job(listeners=[Watch()], fail=True).execute()
    assert seen == ["RuntimeError"]


def test_listener_on_throwable_handled_suppresses():
    from scalding_spark.job import FlowListener

    class Handle(FlowListener):
        def on_throwable(self, job, exc):
            return True  # handled: execute() reports failure, no raise

    assert _make_noop_job(listeners=[Handle()], fail=True).execute() is False


# -- tutorial parity (reference tutorial/Tutorial0-6.scala) ------------------

def test_tutorial_parity_jobs_end_to_end(spark, tmp_path):
    """All seven ported tutorial jobs run on TextLine/Csv data and produce
    the shapes the originals document."""
    from examples import tutorial_parity_jobs as tp

    hello = tmp_path / "hello.txt"
    hello.write_text("Hello world\nGoodbye world\n")
    words = tmp_path / "words.txt"
    words.write_text("hello\nworld\ngoodbye\n")
    phones = tmp_path / "phones.txt"
    phones.write_text("ada lovelace 555-0100 36 uk\n"
                      "alan turing 555-0101 41 uk\n")

    def run(cls, extra):
        out = str(tmp_path / cls.__name__)
        cls(Args(["--input", str(hello), "--output", out] + extra),
            spark).run()
        return [r[0] for r in
                spark.read.option("sep", "\t").csv(out).collect()]

    assert sorted(run(tp.Tutorial0, [])) == ["Goodbye world", "Hello world"]
    assert sorted(run(tp.Tutorial1, [])) == ["Goodbye world", "Hello world"]

    out2 = str(tmp_path / "t2")
    tp.Tutorial2(Args(["--input", str(hello), "--output", out2]), spark).run()
    rows = {tuple(r) for r in
            spark.read.option("sep", "\t").csv(out2).collect()}
    assert ("Hello world", "dlrow olleH") in rows

    assert sorted(run(tp.Tutorial3, [])) == \
        ["Goodbye", "Hello", "world", "world"]

    out4 = str(tmp_path / "t4")
    tp.Tutorial4(Args(["--input", str(hello), "--output", out4]), spark).run()
    counts = {r[0]: int(r[1]) for r in
              spark.read.option("sep", "\t").csv(out4).collect()}
    assert counts == {"Hello": 1, "Goodbye": 1, "world": 2}

    out5 = str(tmp_path / "t5")
    tp.Tutorial5(Args(["--input", str(hello), "--output", out5,
                       "--words", str(words)]), spark).run()
    scored = {r[0]: float(r[1]) for r in
              spark.read.option("sep", "\t").csv(out5).collect()}
    # scores: hello=0, world=1, goodbye=2 (line offsets)
    assert scored == {"Hello world": 1.0, "Goodbye world": 3.0}

    out6 = str(tmp_path / "t6")
    tp.Tutorial6(Args(["--input", str(phones), "--output", out6]), spark).run()
    full = {tuple(r) for r in
            spark.read.option("sep", "\t").csv(out6).collect()}
    assert full == {("ada lovelace", "36"), ("alan turing", "41")}


def test_matrix_tutorial_jobs_end_to_end(spark, tmp_path):
    """The seven matrix-tutorial ports run on a small follow graph and
    reproduce hand-computed results."""
    from examples import matrix_tutorial_jobs as mt

    edges = tmp_path / "edges.tsv"
    edges.write_text("1\t2\t1.0\n1\t3\t1.0\n2\t3\t1.0\n3\t1\t1.0\n")

    def read(out):
        return [tuple(r) for r in
                spark.read.option("sep", "\t").csv(str(out)).collect()]

    out0 = tmp_path / "deg"
    mt.GraphOutDegreeJob(Args(["--input", str(edges), "--output", str(out0)]),
                         spark).run()
    assert {(r[0], float(r[1])) for r in read(out0)} == \
        {("1", 2.0), ("2", 1.0), ("3", 1.0)}

    out1 = tmp_path / "cofollow"
    mt.CofollowsJob(Args(["--input", str(edges), "--output", str(out1)]),
                    spark).run()
    co = {(r[0], r[1]): float(r[2]) for r in read(out1)}
    assert co[("1", "1")] == 2.0 and co[("1", "2")] == 1.0
    assert ("1", "3") not in co          # no common targets, zero pruned

    out2 = tmp_path / "filtered"
    mt.FilterOutdegreeJob(Args(["--input", str(edges), "--output", str(out2),
                                "--maxOutdegree", "2"]), spark).run()
    assert {(r[0], r[1]) for r in read(out2)} == {("2", "3"), ("3", "1")}

    out3 = tmp_path / "inter"
    mt.ComputeMatrixIntersectionJob(
        Args(["--input1", str(edges), "--input2", str(edges),
              "--intersection", str(out3)]), spark).run()
    assert {(r[0], r[1]) for r in read(out3)} == \
        {("1", "2"), ("1", "3"), ("2", "3"), ("3", "1")}

    out4 = tmp_path / "cos"
    mt.ComputeCosineJob(Args(["--input", str(edges), "--output", str(out4)]),
                        spark).run()
    cos = {(r[0], r[1]): float(r[2]) for r in read(out4)}
    assert cos[("1", "1")] == pytest.approx(1.0)
    assert cos[("1", "2")] == pytest.approx(2 ** -0.5)

    out5 = tmp_path / "jac"
    mt.ComputeJaccardJob(Args(["--input", str(edges), "--output", str(out5)]),
                         spark).run()
    jac = {(r[0], r[1]): float(r[2]) for r in read(out5)}
    assert jac[("1", "2")] == pytest.approx(0.5)   # |{3}| / |{2,3}∪{3}|
    assert jac[("1", "1")] == pytest.approx(1.0)

    dw = tmp_path / "docword.tsv"
    dw.write_text("1\ta\t2.0\n1\tb\t1.0\n2\ta\t1.0\n")
    out6 = tmp_path / "tfidf"
    mt.TfIdfJob(Args(["--input", str(dw), "--output", str(out6),
                      "--nrWords", "1"]), spark).run()
    top = {r[0]: r[1] for r in read(out6)}
    # b is rarer (df 1 vs 2): idf wins over a's higher tf in doc 1
    assert top == {"1": "b", "2": "a"}


def test_incremental_corpus_job_three_batches(spark, tmp_path):
    """Three overlapping crawl batches: corpus accumulates each distinct
    content exactly once; the fingerprint store advances one version per
    batch."""
    from examples.incremental_corpus_job import IncrementalCorpusJob

    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "fps")
    batches = [
        [(1, "alpha doc"), (2, "beta doc"), (3, "alpha  DOC!")],   # 3 ~ 1
        [(10, "beta doc"), (11, "gamma doc")],                     # 10 seen
        [(20, "gamma doc"), (21, "delta doc"), (22, "alpha doc")],
    ]
    for i, rows in enumerate(batches):
        b = tmp_path / f"batch{i}.parquet"
        spark.createDataFrame(rows, "doc_id: bigint, text: string") \
            .write.parquet(str(b))
        IncrementalCorpusJob(
            Args(["--batch", str(b), "--corpus", corpus,
                  "--store", store]), spark).run()

    got = spark.read.parquet(corpus)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["alpha doc", "beta doc", "delta doc", "gamma doc"]
    from scalding_spark.sources.time_pathed import VersionedKeyValSource
    vs = VersionedKeyValSource(store, key_col="fp", val_col="n")
    assert vs.versions() == [0, 1, 2]
    assert vs.read(spark).count() == 4      # one fingerprint per content


def test_search_corpus_job_end_to_end(spark, tmp_path):
    """BM25 search job: runs, ranks, and the top hit actually contains a
    query term."""
    from examples.search_corpus_job import SearchCorpusJob
    out = str(tmp_path / "hits")
    SearchCorpusJob(
        Args(["--input", "/root/testdata/sf0.001/documents.parquet",
              "--query", "spark join window", "--k", "5",
              "--output", out]), spark).run()
    got = spark.read.parquet(out)
    rows = got.orderBy(got.score.desc()).collect()
    assert 0 < len(rows) <= 5
    assert {"doc_id", "n_match_terms", "score", "text", "source"} \
        <= set(got.columns)
    assert any(t in rows[0]["text"] for t in ("spark", "join", "window"))
    assert rows[0]["score"] >= rows[-1]["score"]
