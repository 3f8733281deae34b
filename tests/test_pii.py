"""functions/pii.scrub_pii: class priority, no double-counting, and
Java/RE2 pattern agreement on the exact class boundary cases."""

from arabicner_spark.functions.pii import scrub_pii


def test_pii_classes_and_priority(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob42@ex-ample.co.uk now"),          # email (digits inside)
            (2, "srv 10.0.200.91 up"),                     # ip (NOT phone-chewed)
            (3, "call +44-555-0042 or 07 11"),             # phone + short digit runs
            (4, "order 12345 confirmed"),                  # bare digit run
            (5, "clean text only"),
        ],
        "id int, text string",
    )
    out = {r.id: r for r in scrub_pii(df, "text").collect()}

    r = out[1]
    assert (r.n_email, r.n_ip, r.n_phone, r.n_num) == (1, 0, 0, 0)
    assert r.scrubbed == "mail <EMAIL> now"  # digits counted ONCE, as email

    r = out[2]
    # ip runs before phone: "10.0.200.91" must not half-match the
    # phone pattern ("10.0.200" would, if phone ran first)
    assert (r.n_email, r.n_ip, r.n_phone, r.n_num) == (0, 1, 0, 0)
    assert r.scrubbed == "srv <IP> up"

    r = out[3]
    assert (r.n_phone, r.n_num) == (1, 2)  # "07" and "11" are digit runs
    assert r.scrubbed == "call <PHONE> or <NUM> <NUM>"

    r = out[4]
    assert (r.n_phone, r.n_num) == (0, 1)
    assert r.scrubbed == "order <NUM> confirmed"

    r = out[5]
    assert (r.n_email, r.n_ip, r.n_phone, r.n_num) == (0, 0, 0, 0)
    assert r.scrubbed == "clean text only"


def test_pii_sql_mirror_matches_spark(spark):
    """The DuckDB mirror produces the identical scrub on the same rows."""
    import duckdb

    from arabicner_spark.functions.pii import sql_scrub_exprs

    rows = [
        (1, "a bob42@ex.co b 10.0.200.91 c +1-555-0042 d 99 e"),
        (2, "no pii here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: (r.n_email, r.n_ip, r.n_phone, r.n_num, r.scrubbed)
        for r in scrub_pii(df, "text").collect()
    }
    e = sql_scrub_exprs("text")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        rid: tuple(rest)
        for rid, *rest in con.execute(
            f"SELECT id, {e['n_email']}, {e['n_ip']}, {e['n_phone']}, {e['n_num']}, {e['scrubbed']} FROM t"
        ).fetchall()
    }
    assert got == want


def test_pii_null_text_counts_zero(spark):
    df = spark.createDataFrame([(1, None), (2, "x 42")], "id int, text string")
    out = {r.id: r for r in scrub_pii(df, "text").collect()}
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone, out[1].n_num) == (0, 0, 0, 0)
    assert out[1].scrubbed == ""
    assert out[2].n_num == 1
