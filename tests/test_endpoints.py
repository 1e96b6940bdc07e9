"""S7 route-layer tests: every function in plans/endpoints.py over tiny
literal frames, pinning the queryset semantics cited from the reference
(api/urls.py:37-132 → COVERAGE.md S7 route map)."""

from __future__ import annotations

from pyspark.sql import functions as F

from django_indexer_spark.plans import endpoints


def _accounts(spark):
    return spark.createDataFrame(
        [("alice.near", 100.0), ("bob.near", 50.0), ("carol.near", 0.0)],
        "id string, total_donations_out_usd double",
    )


def _donations(spark):
    return spark.createDataFrame(
        [
            # id, donor, recipient, pot, matching_pool, usd
            (1, "alice.near", "proj1.near", "pot1", True, 10.0),
            (2, "alice.near", "proj2.near", "pot1", False, 5.0),
            (3, "bob.near", "proj1.near", None, False, 2.0),
            (4, "alice.near", "proj1.near", "pot2", True, 1.0),
        ],
        "id long, donor_id string, recipient_id string, pot_id string,"
        " matching_pool boolean, total_amount_usd double",
    )


def test_accounts_routes(spark):
    accounts = _accounts(spark)
    assert [r["id"] for r in endpoints.accounts_list(accounts, page=1, page_size=2).collect()] == [
        "alice.near",
        "bob.near",
    ]
    assert endpoints.account_detail(accounts, "bob.near").count() == 1
    assert endpoints.account_detail(accounts, "nobody.near").count() == 0
    # keyset cursor: the page AFTER alice == what page 2 serves
    assert [
        r["id"]
        for r in endpoints.accounts_list(accounts, after=("alice.near",), page_size=2).collect()
    ] == ["bob.near", "carol.near"]


def test_account_donation_routes_are_symmetric(spark):
    d = _donations(spark)
    assert {r["id"] for r in endpoints.account_donations_sent(d, "alice.near").collect()} == {1, 2, 4}
    assert {r["id"] for r in endpoints.account_donations_received(d, "proj1.near").collect()} == {1, 3, 4}


def test_account_payouts_received_requires_paid(spark):
    payouts = spark.createDataFrame(
        [("pot1", "proj1.near", "100", "2024-01-01"), ("pot1", "proj1.near", "50", None)],
        "pot_id string, recipient_id string, amount string, paid_at string",
    )
    got = endpoints.account_payouts_received(payouts, "proj1.near").collect()
    assert len(got) == 1 and got[0]["amount"] == "100"  # unpaid row excluded (F3)


def test_account_active_pots_approved_and_live(spark):
    apps = spark.createDataFrame(
        [
            ("pot1", "alice.near", "Approved"),
            ("pot2", "alice.near", "Pending"),
            ("pot3", "alice.near", "Approved"),
            ("pot1", "bob.near", "Approved"),
        ],
        "pot_id string, applicant_id string, current_status string",
    )
    pots = spark.createDataFrame(
        [
            ("pot1", "2024-01-01 00:00:00", "2024-12-31 00:00:00"),
            ("pot2", "2024-01-01 00:00:00", "2024-12-31 00:00:00"),
            ("pot3", "2020-01-01 00:00:00", "2020-12-31 00:00:00"),  # round over
        ],
        "account_id string, matching_round_start string, matching_round_end string",
    ).select(
        "account_id",
        F.col("matching_round_start").cast("timestamp").alias("matching_round_start"),
        F.col("matching_round_end").cast("timestamp").alias("matching_round_end"),
    )
    all_pots = {r["account_id"] for r in endpoints.account_active_pots(apps, pots, "alice.near").collect()}
    assert all_pots == {"pot1", "pot3"}  # approved only, pending excluded
    live = {
        r["account_id"]
        for r in endpoints.account_active_pots(
            apps, pots, "alice.near", status="live", now=F.lit("2024-06-01 00:00:00").cast("timestamp")
        ).collect()
    }
    assert live == {"pot1"}  # pot3 approved but round over


def test_pot_sponsors_distinct_matching_pool_donors(spark):
    got = {
        r["id"]
        for r in endpoints.pot_sponsors(_accounts(spark), _donations(spark), "pot1").collect()
    }
    # alice has TWO pot1 donations but only the matching_pool one counts,
    # and she appears once; bob's donation is direct → excluded
    assert got == {"alice.near"}


def test_list_random_registration_seeded_and_filtered(spark):
    regs = spark.createDataFrame(
        [(1, 7, "p1.near", "Approved"), (2, 7, "p2.near", "Pending"), (3, 8, "p3.near", "Approved")],
        "id long, list_id long, registrant_id string, status string",
    )
    got = endpoints.list_random_registration(regs, 7, status="Approved", seed=1).collect()
    assert len(got) == 1 and got[0]["registrant_id"] == "p1.near"  # only candidate
    # same seed → same pick across runs (O5 determinism)
    a = endpoints.list_random_registration(regs, 7, seed=5).collect()[0]["id"]
    b = endpoints.list_random_registration(regs, 7, seed=5).collect()[0]["id"]
    assert a == b
    assert {r["id"] for r in endpoints.list_registrations(regs, 7).collect()} == {1, 2}
    assert endpoints.account_list_registrations(regs, "p3.near").collect()[0]["list_id"] == 8


def test_pot_routes_filter_by_pot(spark):
    d = _donations(spark)
    assert {r["id"] for r in endpoints.pot_donations(d, "pot1").collect()} == {1, 2}
    apps = spark.createDataFrame(
        [("pot1", "a.near", "Approved"), ("pot2", "b.near", "Pending")],
        "pot_id string, applicant_id string, current_status string",
    )
    assert endpoints.pot_applications(apps, "pot2").collect()[0]["applicant_id"] == "b.near"
    payouts = spark.createDataFrame(
        [("pot1", "x.near", "1", None), ("pot2", "y.near", "2", None)],
        "pot_id string, recipient_id string, amount string, paid_at string",
    )
    assert endpoints.pot_payouts(payouts, "pot1").collect()[0]["recipient_id"] == "x.near"


def test_config_and_factories(spark):
    cfg = spark.createDataFrame(
        [("f1", '{"fee": 1}', 1), ("f1", '{"fee": 2}', 2), ("f2", '{"fee": 9}', 1)],
        "factory_id string, config_json string, version long",
    )
    got = {r["factory_id"]: r["config_json"] for r in endpoints.donate_contract_config(cfg).collect()}
    assert got == {"f1": '{"fee": 2}', "f2": '{"fee": 9}'}  # latest per factory
    factories = spark.createDataFrame([("f2",), ("f1",)], "id string")
    assert [r["id"] for r in endpoints.pot_factories(factories).collect()] == ["f1", "f2"]


def test_donors_and_stats_delegate_to_domain(spark):
    accounts, d = _accounts(spark), _donations(spark)
    donors = [r["id"] for r in endpoints.donors(accounts, d).collect()]
    assert donors == ["alice.near", "bob.near"]  # carol never donated (J4)
    payouts = spark.createDataFrame(
        [("pot1", "proj1.near", 3.0, "2024-01-01")],
        "pot_id string, recipient_id string, amount_paid_usd double, paid_at string",
    )
    s = endpoints.stats(d, payouts).collect()[0]
    assert s["total_donations_count"] == 4 and s["total_payouts_usd"] == 3.0
