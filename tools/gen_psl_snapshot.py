"""Regenerate clickhouse_sinker_spark/functions/psl_snapshot.py from the
system copy of the PUBLIC Mozilla Public Suffix List (Debian
``publicsuffix`` package).  Keeps only the entries that can match the
LAST TWO host labels — the only check ClickHouse's
firstSignificantSubdomain algorithm performs (see the snapshot module's
docstring)."""
import sys

SRC = "/usr/share/publicsuffix/public_suffix_list.dat"
DST = "clickhouse_sinker_spark/functions/psl_snapshot.py"

HEADER = '''"""Two-label slice of the Mozilla Public Suffix List.

Source: the PUBLIC https://publicsuffix.org list (Mozilla Public License
2.0), as shipped by the Debian ``publicsuffix`` package snapshot in this
build environment (/usr/share/publicsuffix/public_suffix_list.dat).
ClickHouse embeds its own snapshot the same way
(contrib top_level_domains; URL/ExtractFirstSignificantSubdomain.h).

Only entries that can match the LAST TWO host labels are kept, because
that is the only check the CH algorithm performs (it tracks just the
last three periods): exact two-label rules, one-label wildcard bases
(``*.x``), and two-label exceptions (``!www.ck``).  Single-label TLDs
never alter the outcome and deeper rules are invisible to the
three-period window — a documented parity property, not a loss.

List snapshots drift over time; a host whose classification changed
between this snapshot and a live CH server's is version skew, not an
algorithm difference (same caveat applies between two CH releases).

Regenerate with tools/gen_psl_snapshot.py.
"""

'''


def main() -> int:
    exact2, wild1, exc2 = [], [], []
    for line in open(SRC, encoding="utf-8"):
        s = line.strip()
        if not s or s.startswith("//"):
            continue
        if s.startswith("!"):
            if s[1:].count(".") == 1:
                exc2.append(s[1:])
            continue
        if s.startswith("*."):
            if s[2:].count(".") == 0:
                wild1.append(s[2:])
            continue
        if s.count(".") == 1:
            exact2.append(s)
    with open(DST, "w", encoding="utf-8") as f:
        f.write(HEADER)
        for name, entries in (("PSL_EXACT2", exact2), ("PSL_WILD1", wild1),
                              ("PSL_EXC2", exc2)):
            f.write(f"{name} = frozenset((\n")
            for e in sorted(entries):
                f.write(f"    {e!r},\n")
            f.write("))\n\n" if name != "PSL_EXC2" else "))\n")
    print(f"wrote {DST}: {len(exact2)} exact2, {len(wild1)} wild, "
          f"{len(exc2)} exceptions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
