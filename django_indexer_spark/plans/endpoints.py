"""REST endpoint surface — every data route in the reference's
api/urls.py:37-132 as a DataFrame function (S7).

plans/domain.py holds the heavy derived-state views (stats rollups,
event-sourced current_* views, USD pricing); this module is the thin
route layer on top: one function per URL, each the declarative twin of
the view's queryset (cited), reusing domain/operator building blocks.
The HTTP/serializer layer itself stays out of engine scope (SURVEY
§2.1 S7) — these functions ARE the endpoint semantics: feed silver/gold
frames, get the route's result rows.

Pagination: the reference paginates every list endpoint with DRF page
numbers (api/pagination.py:8-9, default size base/settings.py:111-115);
pass page/page_size to get the identical slice via the deterministic O3
paginator. page=None returns the full ordered set (for callers that
paginate downstream).

Caching: the reference fronts hot routes with cache_page(300)
(accounts/api.py:195 etc.). The Spark-side analogue is materializing
these functions' outputs as gold tables on the 300 s trigger
(streaming.pipeline), which the stats/leaderboard path already does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.joins import semi
from ..operators.sorts import DEFAULT_PAGE_SIZE, paginate, paginate_after, seeded_sample_one
from . import domain


def _page(
    df: DataFrame,
    keys: list[str],
    page: int | None,
    page_size: int,
    after: tuple | None = None,
) -> DataFrame:
    """Route pagination: DRF-style page numbers (the reference's surface)
    or keyset cursors (``after`` = last key tuple of the previous page —
    the deep-crawl form; see operators.sorts.paginate_after). ``after``
    wins when both are given; page=None and after=None → full ordered set."""
    if after is not None:
        return paginate_after(df, keys, last_seen=after, page_size=page_size)
    order_by = [F.asc(k) for k in keys]
    if page is None:
        return df.orderBy(*order_by)
    return paginate(df, order_by, page=page, page_size=page_size)


# ---------------------------------------------------------------- accounts


def accounts_list(
    accounts: DataFrame,
    page: int | None = None,
    page_size: int = DEFAULT_PAGE_SIZE,
    after: tuple | None = None,
) -> DataFrame:
    """GET v1/accounts (AccountsListAPI, accounts/api.py:64-77): all
    accounts in the model's id ordering (accounts/models.py:64-65)."""
    return _page(accounts, ["id"], page, page_size, after=after)


def account_detail(accounts: DataFrame, account_id: str) -> DataFrame:
    """GET v1/accounts/<id> (AccountDetailAPI): pk lookup → 0/1 rows."""
    return accounts.filter(F.col("id") == account_id)


def account_active_pots(
    applications: DataFrame,
    pots: DataFrame,
    account_id: str,
    status: str | None = None,
    now: Column | None = None,
) -> DataFrame:
    """GET v1/accounts/<id>/active_pots (accounts/api.py:196-217):
    pots where the account has an APPROVED application; ?status=live adds
    the round-in-progress window (F4)."""
    approved = applications.filter(
        (F.col("applicant_id") == account_id) & (F.col("current_status") == "Approved")
    )
    out = semi(pots, approved, pots["account_id"] == approved["pot_id"])
    if status == "live":
        now = F.current_timestamp() if now is None else now
        out = domain.active_pots(out, now)
    return out


def account_pot_applications(applications: DataFrame, account_id: str) -> DataFrame:
    """GET v1/accounts/<id>/pot_applications (accounts/api.py:262)."""
    return applications.filter(F.col("applicant_id") == account_id)


def account_donations_received(donations: DataFrame, account_id: str) -> DataFrame:
    """GET v1/accounts/<id>/donations_received (accounts/api.py:310)."""
    return domain.account_donations_received(donations, account_id)


def account_donations_sent(donations: DataFrame, account_id: str) -> DataFrame:
    """GET v1/accounts/<id>/donations_sent (accounts/api.py:351)."""
    return donations.filter(F.col("donor_id") == account_id)


def account_payouts_received(pot_payouts: DataFrame, account_id: str) -> DataFrame:
    """GET v1/accounts/<id>/payouts_received (accounts/api.py:392):
    fulfilled payouts only (paid_at IS NOT NULL, F3)."""
    return pot_payouts.filter(
        (F.col("recipient_id") == account_id) & F.col("paid_at").isNotNull()
    )


def account_list_registrations(registrations: DataFrame, account_id: str) -> DataFrame:
    """GET v1/accounts/<id>/list-registrations (accounts/api.py:433)."""
    return registrations.filter(F.col("registrant_id") == account_id)


def donors(
    accounts: DataFrame, donations: DataFrame, k: int | None = None
) -> DataFrame:
    """GET v1/donors (DonorsAPI, accounts/api.py:80-92)."""
    return domain.donors_leaderboard(accounts, donations, k)


# ------------------------------------------------------------------ config


def donate_contract_config(config_events: DataFrame) -> DataFrame:
    """GET v1/donate_contract_config (donations/api.py): the reference
    proxies a live RPC view call (S4). Engine-side, the config is the
    latest row of the factory/contract config dimension kept fresh by
    streaming.enrich — serve that."""
    from ..operators.windows import top1_per_group

    return top1_per_group(config_events, ["factory_id"], [F.desc("version")])


# ------------------------------------------------------------------- lists


def lists_list(
    lists: DataFrame,
    page: int | None = None,
    page_size: int = DEFAULT_PAGE_SIZE,
    after: tuple | None = None,
) -> DataFrame:
    """GET v1/lists (ListsListAPI, lists/api.py): current list state
    (feed domain.current_lists output)."""
    return _page(lists, ["id"], page, page_size, after=after)


def list_detail(lists: DataFrame, list_id: int) -> DataFrame:
    """GET v1/lists/<id> (ListDetailAPI)."""
    return lists.filter(F.col("id") == list_id)


def list_registrations(
    registrations: DataFrame, list_id: int, status: str | None = None
) -> DataFrame:
    """GET v1/lists/<id>/registrations (lists/api.py:150-170), optional
    ?status filter (F1)."""
    out = registrations.filter(F.col("list_id") == list_id)
    if status is not None:
        out = out.filter(F.col("status") == status)
    return out


def list_random_registration(
    registrations: DataFrame, list_id: int, status: str | None = None, seed: int = 42
) -> DataFrame:
    """GET v1/lists/<id>/random_registration (lists/api.py:197-225):
    random.choice over the (optionally status-filtered) registrations —
    O5 with a pinned seed for reproducibility."""
    return seeded_sample_one(list_registrations(registrations, list_id, status), seed)


# -------------------------------------------------------------------- pots


def pots_list(
    pots: DataFrame,
    page: int | None = None,
    page_size: int = DEFAULT_PAGE_SIZE,
    after: tuple | None = None,
) -> DataFrame:
    """GET v1/pots (PotsListAPI, pots/api.py): feed domain.pot_stats
    output for the stat-bearing serializer fields."""
    return _page(pots, ["account_id"], page, page_size, after=after)


def pot_detail(pots: DataFrame, pot_id: str) -> DataFrame:
    """GET v1/pots/<id>/ (PotDetailAPI)."""
    return pots.filter(F.col("account_id") == pot_id)


def pot_applications(applications: DataFrame, pot_id: str) -> DataFrame:
    """GET v1/pots/<id>/applications (pots/api.py): feed
    domain.current_applications output so review mutations are applied."""
    return applications.filter(F.col("pot_id") == pot_id)


def pot_donations(donations: DataFrame, pot_id: str) -> DataFrame:
    """GET v1/pots/<id>/donations (pots/api.py)."""
    return donations.filter(F.col("pot_id") == pot_id)


def pot_sponsors(accounts: DataFrame, donations: DataFrame, pot_id: str) -> DataFrame:
    """GET v1/pots/<id>/sponsors (pots/api.py:243-259): accounts having a
    matching-pool donation to the pot (J4 semi over the distinct donor
    set — the reference's values_list(...).distinct() subquery)."""
    sponsor_d = donations.filter(
        (F.col("pot_id") == pot_id) & F.col("matching_pool")
    )
    return semi(accounts, sponsor_d, accounts["id"] == sponsor_d["donor_id"])


def pot_payouts(pot_payouts_df: DataFrame, pot_id: str) -> DataFrame:
    """GET v1/pots/<id>/payouts (pots/api.py:262+)."""
    return pot_payouts_df.filter(F.col("pot_id") == pot_id)


def pot_factories(factories: DataFrame) -> DataFrame:
    """GET v1/potfactories (PotFactoriesAPI, pots/api.py)."""
    return factories.orderBy(F.asc("id"))


# ------------------------------------------------------------------- stats


def stats(donations: DataFrame, pot_payouts_df: DataFrame) -> DataFrame:
    """GET v1/stats (base/api.py:60-89)."""
    return domain.stats(donations, pot_payouts_df)
