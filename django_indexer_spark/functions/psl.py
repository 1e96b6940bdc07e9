"""Public-Suffix-List registered domains — broadcast dim + in-row match.

``functions.urls.registered_domain`` is an honest LABEL HEURISTIC (last
two labels, three under a generic 2LD); real crawl curation keys
per-domain caps (``sampling.cap_per_group``) and frontier politeness on
the REGISTRABLE domain, and the heuristic misgroups multi-tenant
suffixes — every ``*.github.io`` tenant collapses to one "domain", so a
per-domain cap silently mass-drops the largest tenant hosts (round-11
verdict #1). The fix is the Public Suffix List (publicsuffix.org —
public data, MPL-2.0): a rule file of public suffixes with wildcard
(``*.ck``) and exception (``!www.ck``) rules.

This module ships:

- ``PSL_SNAPSHOT`` — a bundled SUBSET snapshot of the PSL (the
  high-traffic ccTLD registries, every wildcard TLD, the canonical
  exception rules, and the major private-section multi-tenant hosts).
  A production deploy swaps in the verbatim ``public_suffix_list.dat``
  (same format) via ``psl_rules(spark, open(path).read())`` — the
  parser accepts the full file unchanged.
- ``psl_rules`` — parse the rule text into a dim DataFrame.
- ``registered_domain_psl`` — the lookup as ONE broadcast equi-join on
  the host's TLD (rules pre-aggregated to array<struct> per TLD — the
  ``apply_robots`` shape) + pure in-row higher-order matching: ZERO
  shuffle on the host side, no UDF, no per-row Python.

PSL algorithm (https://publicsuffix.org/list/ — the published
matching rules):

1. a rule matches when the host's right-aligned labels equal the
   rule's labels, '*' matching exactly one label;
2. the prevailing rule is the matching EXCEPTION rule if any, else the
   matching rule with the most labels, else the default rule '*';
3. the public suffix is the prevailing rule's labels (minus the
   leftmost label for an exception rule);
4. the registrable domain is the public suffix plus one more host
   label — NULL when the host IS a public suffix (or has fewer
   labels).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# A SUBSET snapshot of the Public Suffix List (publicsuffix.org, public
# data). Format-identical to public_suffix_list.dat: one rule per line,
# '//' comments, '!' exceptions, '*' wildcard labels. Production swaps
# in the full file; this subset covers the rule CLASSES (plain,
# multi-label, wildcard, exception, private multi-tenant) plus the
# registries a test corpus actually hits.
PSL_SNAPSHOT = """\
// ===BEGIN ICANN DOMAINS===
com
net
org
edu
gov
mil
int
info
biz
name
io
co
ai
app
dev
me
tv
xyz
// United Kingdom
uk
ac.uk
co.uk
gov.uk
ltd.uk
me.uk
net.uk
nhs.uk
org.uk
plc.uk
sch.uk
// Australia
au
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// Japan (incl. the canonical wildcard+exception city rules)
jp
ac.jp
ad.jp
co.jp
ed.jp
go.jp
gr.jp
lg.jp
ne.jp
or.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// Brazil
br
com.br
net.br
org.br
gov.br
edu.br
// India
in
co.in
net.in
org.in
gen.in
firm.in
ind.in
// China
cn
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
// South Korea
kr
co.kr
ne.kr
or.kr
re.kr
go.kr
ac.kr
// New Zealand
nz
co.nz
net.nz
org.nz
govt.nz
ac.nz
// South Africa
za
co.za
net.za
org.za
gov.za
ac.za
web.za
// Mexico / Argentina / Turkey / Russia / Ukraine
mx
com.mx
gob.mx
org.mx
ar
com.ar
gob.ar
org.ar
tr
com.tr
gov.tr
org.tr
edu.tr
ru
ua
com.ua
net.ua
// Germany / France / Netherlands / Italy / Spain / Poland
de
fr
nl
it
es
pl
com.pl
net.pl
org.pl
// wildcard-only TLD registries (every label under them is a suffix)
bd
*.bd
ck
*.ck
!www.ck
er
*.er
fk
*.fk
mm
*.mm
np
*.np
pg
*.pg
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
// multi-tenant platform suffixes — the class the heuristic misgroups
github.io
githubusercontent.com
gitlab.io
blogspot.com
appspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
azurewebsites.net
cloudfront.net
fastly.net
global.ssl.fastly.net
s3.amazonaws.com
s3.us-east-1.amazonaws.com
s3.us-west-2.amazonaws.com
s3.eu-west-1.amazonaws.com
elb.amazonaws.com
pages.dev
workers.dev
fly.dev
onrender.com
readthedocs.io
neocities.org
wordpress.com
tumblr.com
weebly.com
wixsite.com
// ===END PRIVATE DOMAINS===
"""


def parse_psl(text: str) -> list[tuple[str, list[str], int, bool]]:
    """Rule lines → (rule, labels_reversed, n_labels, is_exception).
    Comments ('//'), blanks, and anything after whitespace on a rule
    line are dropped — the published file's parsing contract."""
    rules = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        line = line.split()[0]  # the spec: rule ends at first whitespace
        is_exc = line.startswith("!")
        rule = line[1:] if is_exc else line
        labels = rule.lower().split(".")
        if not all(labels):
            continue  # malformed (leading/trailing dot)
        rules.append((rule.lower(), list(reversed(labels)), len(labels), is_exc))
    return rules


def psl_rules(spark: SparkSession, psl_text: str | None = None) -> DataFrame:
    """The PSL as a dim DataFrame: (rule, labels_rev, n_labels,
    is_exception). ``psl_text`` defaults to the bundled snapshot;
    pass the full public_suffix_list.dat contents in production. A
    bounded driver-side parse of a KB–MB dim file, not a data path."""
    return spark.createDataFrame(
        parse_psl(PSL_SNAPSHOT if psl_text is None else psl_text),
        "rule string, labels_rev array<string>, n_labels int, is_exception boolean",
    )


def _is_ip_literal(host: Column) -> Column:
    # IPv4 dotted quad or a bracketed/raw IPv6 literal — the PSL does
    # not apply to IP hosts (no registrable domain)
    return F.regexp_like(host, F.lit(r"^\d{1,3}(\.\d{1,3}){3}$")) | host.contains(
        ":"
    )


def registered_domain_psl(
    df: DataFrame,
    psl: DataFrame,
    host_col: str = "host",
    out_col: str = "registered_domain",
) -> DataFrame:
    """Append the PSL registrable domain of ``host_col`` as
    ``out_col`` (NULL when the host IS a public suffix, is a single
    unlisted label, or is an IP literal).

    Scale shape: the PSL (~10k rules for the full file) is aggregated
    to ONE array<struct> row per TLD (rules per TLD are dozens at
    most) and broadcast; the host side takes ONE broadcast equi-join
    on its last label and evaluates every candidate rule IN-ROW with
    filter/zip_with/forall/array_max — zero host-side shuffle, no UDF,
    no row id, nothing collected. Hosts under unlisted TLDs miss the
    join and fall to the PSL default rule '*' (public suffix = the
    TLD itself). Wildcard '*' matches exactly one label; the
    prevailing-rule ordering (exception beats all, then most labels)
    is the array_max struct ordering."""
    rules = (
        psl.select(
            F.element_at("labels_rev", 1).alias("__tld"),
            F.struct(
                F.col("is_exception").cast("int").alias("e"),
                F.col("n_labels").alias("n"),
                F.col("labels_rev").alias("lr"),
            ).alias("__rule"),
        )
        .groupBy("__tld")
        .agg(F.collect_list("__rule").alias("__rules"))
    )
    host = F.lower(F.col(host_col))
    hrev = F.reverse(F.split(host, r"\."))
    joined = df.withColumn("__hrev", hrev).join(
        F.broadcast(rules),
        F.element_at(F.col("__hrev"), 1) == F.col("__tld"),
        "left",
    )

    # a rule matches when every rule label equals the aligned host
    # label or is '*'; zip_with null-pads the shorter array, so a rule
    # longer than the host fails on the null host label and a rule
    # shorter than the host trivially matches its null rule-label tail
    def matches(r):
        return F.forall(
            F.zip_with(
                r["lr"],
                F.col("__hrev"),
                lambda rl, hl: rl.isNull()
                | (hl.isNotNull() & ((rl == F.lit("*")) | (rl == hl))),
            ),
            lambda ok: ok,
        )

    best = F.array_max(
        F.transform(
            F.filter(F.col("__rules"), matches),
            lambda r: F.struct(r["e"].alias("e"), r["n"].alias("n")),
        )
    )
    ps_n = (
        F.when(best.isNull(), F.lit(1))
        .when(best["e"] == 1, best["n"] - 1)
        .otherwise(best["n"])
    )
    reg = F.when(
        _is_ip_literal(F.lower(F.col(host_col)))
        | (F.size("__hrev") <= ps_n)
        | F.col(host_col).isNull(),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat_ws(".", F.reverse(F.slice(F.col("__hrev"), 1, ps_n + 1)))
    )
    return joined.select(*df.columns, reg.alias(out_col))
