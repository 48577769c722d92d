"""Access-log ingestion — Apache/nginx Combined Log Format lines.

Web-server logs are the operational twin of WARC in a crawl stack
(fetch audits, politeness verification, referer graphs) and a
structured corpus in their own right.  The Combined Log Format is
public and rigidly machine-generated::

    host ident user [dd/Mon/yyyy:HH:MM:SS +0000] "METHOD path HTTP/v"
        status bytes "referer" "user-agent"

so the parser is ONE codegen'd regexp projection — zero Python, zero
exchanges, line-parallel (the same stance as the Stack-Exchange dump
leg).  Per line: host, epoch-second timestamp (fixed English month
table via a CASE chain — no locale, no SimpleDateFormat surprises),
method, path, HTTP status, response bytes (``-`` → NULL), referer and
user-agent (``"-"`` → NULL).  Lines that don't match the shape yield
a NULL row with ``valid=false`` (O6: junk is visible, never fatal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CLF_RE = (
    r'^(\S+) (\S+) (\S+) \[(\d{2})/([A-Z][a-z]{2})/(\d{4})'
    r':(\d{2}):(\d{2}):(\d{2}) ([+-]\d{4})\] '
    r'"([A-Z]+) (\S+) HTTP/[0-9.]+" (\d{3}) (\d+|-)'
    r'(?: "([^"]*)" "([^"]*)")?\s*$'
)

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _month_num(col: Column) -> Column:
    """English month abbreviation → 1–12 as one CASE chain (no locale,
    no SimpleDateFormat)."""
    case = F.when(col == _MONTHS[0], 1)
    for i, m in enumerate(_MONTHS[1:], start=2):
        case = case.when(col == m, i)
    return case


def parse_access_log(lines: DataFrame, line_col: str = "line"
                     ) -> DataFrame:
    """CLF lines → ``(host, ts, method, path, status, n_bytes, referer,
    user_agent, valid)``.  Pure JVM projection, zero exchanges."""
    line = F.col(line_col)

    def g(i: int) -> Column:
        return F.nullif(F.regexp_extract(line, _CLF_RE, i), F.lit(""))

    day, mon, year = g(4), _month_num(g(5)), g(6)
    hh, mm, ss, zone = g(7), g(8), g(9), g(10)
    # timezone-free epoch arithmetic: DATE difference is calendar math
    # (no session-timezone dependence, unlike unix_timestamp), then the
    # declared numeric offset shifts wall time to UTC
    date = F.concat_ws("-", year, F.lpad(mon.cast("string"), 2, "0"),
                       day).cast("date")
    off_sec = (
        (F.substring(zone, 2, 2).cast("long") * 3600
         + F.substring(zone, 4, 2).cast("long") * 60)
        * F.when(F.substring(zone, 1, 1) == "-", -1).otherwise(1)
    )
    epoch = (
        F.datediff(date, F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + hh.cast("long") * 3600 + mm.cast("long") * 60 + ss.cast("long")
        - off_sec
    )
    valid = g(1).isNotNull() & g(11).isNotNull() & g(13).isNotNull()
    return lines.select(
        F.when(valid, g(1)).alias("host"),
        F.when(valid, epoch).cast("long").alias("ts"),
        F.when(valid, g(11)).alias("method"),
        F.when(valid, g(12)).alias("path"),
        F.when(valid, g(13)).cast("int").alias("status"),
        F.when(valid & (g(14) != "-"), g(14)).cast("long")
        .alias("n_bytes"),
        F.when(valid & (g(15) != "-"), g(15)).alias("referer"),
        F.when(valid & (g(16) != "-"), g(16)).alias("user_agent"),
        valid.alias("valid"),
    )
