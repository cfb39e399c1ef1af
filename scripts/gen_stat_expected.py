#!/usr/bin/env python3
"""Generate data/stat_cdf_expected.parquet — the committed expected-value
table behind the `trino_statistical_fns` oracle.

Every value is derived INDEPENDENTLY of the engine's Scala
implementations, so the row is a real oracle:

- ncdf:  Python stdlib statistics.NormalDist().cdf (C-library erf)
- incdf: statistics.NormalDist().inv_cdf (Wichura AS241)
- bcdf:  I_x(2,5) via the exact binomial closed form
         I_x(a,b) = sum_{j=a}^{a+b-1} C(a+b-1,j) x^j (1-x)^(a+b-1-j)
         (integer parameters make the regularized incomplete beta a
         polynomial), cross-checked against a Numerical-Recipes-style
         continued fraction
- tcdf:  Student-t CDF for even df via the elementary closed form
         F(t) = 1/2 + (t / (2 sqrt(t^2+df))) * sum_{j<df/2} C(2j,j)/4^j
                * (df/(t^2+df))^j, cross-checked the same way
- mac / mac_md5: RFC 2104 HMAC over the constant message
         'graft-msg-<doc_id>' with key 'graft-key' (Python stdlib hmac)
- word / stem1: Porter's published example vocabulary (from the 1980
         paper's step examples) and its published stems

CDF inputs are doc_id-derived constants (doc_id 0..24), so the table is
independent of the testdata's document text. Values are rounded to 6
decimals at generation time; a margin check refuses inputs whose true
value sits within 1e-8 of a rounding boundary (where two correct
implementations could legally round apart).
"""
import hashlib
import hmac
import math
import os
from statistics import NormalDist

import duckdb

OUT = os.path.join(os.path.dirname(__file__), "..", "data",
                   "stat_cdf_expected.parquet")

# Porter (1980) step examples: word -> published stem
PORTER = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
    ("agreed", "agre"), ("plastered", "plaster"), ("bled", "bled"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubled", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("tanned", "tan"), ("falling", "fall"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"),
]


def beta_cdf_25(x: float) -> float:
    n = 6  # a=2, b=5 -> a+b-1
    return sum(math.comb(n, j) * x**j * (1 - x)**(n - j) for j in range(2, n + 1))


def t_cdf_10(t: float) -> float:
    df = 10
    u = df / (t * t + df)
    s = sum((math.comb(2 * j, j) / 4**j) * u**j for j in range(df // 2))
    return 0.5 + (t / (2 * math.sqrt(t * t + df))) * s


def betacf(a, b, x):
    qab, qap, qam = a + b, a + 1, a - 1
    c, d = 1.0, 1.0 - qab * x / qap
    d = 1.0 / (d if abs(d) > 1e-300 else 1e-300)
    h = d
    for m in range(1, 201):
        m2 = 2 * m
        for aa in (m * (b - m) * x / ((qam + m2) * (a + m2)),
                   -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))):
            d = 1.0 + aa * d
            c = 1.0 + aa / c
            d = 1.0 / (d if abs(d) > 1e-300 else 1e-300)
            c = c if abs(c) > 1e-300 else 1e-300
            h *= d * c
    return h


def betainc(a, b, x):
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    bt = math.exp(math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                  + a * math.log(x) + b * math.log(1 - x))
    if x < (a + 1) / (a + b + 2):
        return bt * betacf(a, b, x) / a
    return 1.0 - bt * betacf(b, a, 1 - x) / b


def main():
    nd = NormalDist()
    key = b"graft-key"
    rows = []
    for d in range(25):
        x = d / 100.0
        p = d / 100.0 + 0.001
        vals = {
            "ncdf": nd.cdf(x),
            "incdf": nd.inv_cdf(p),
            "bcdf": beta_cdf_25(p),
            "tcdf": t_cdf_10(x),
        }
        # cross-check the closed forms against the continued fraction
        assert abs(vals["bcdf"] - betainc(2, 5, p)) < 1e-12
        tref = 0.5 * betainc(5, 0.5, 10 / (10 + x * x))
        assert abs(vals["tcdf"] - (1 - tref if x > 0 else 0.5)) < 1e-12
        # rounding-boundary margin: two correct implementations must not
        # be able to round to different 6dp values. 1e-3 in 1e-6 units
        # = the true value is >1e-9 from the boundary, while correct
        # CDF implementations agree to ~1e-12.
        for k, v in vals.items():
            margin = abs((v * 1e6) % 1 - 0.5)
            assert margin > 1e-3, f"{k}({d}) too close to a rounding boundary"
        msg = f"graft-msg-{d}".encode()
        word, stem = PORTER[d]
        rows.append((d, word, stem,
                     hmac.new(key, msg, hashlib.sha256).hexdigest(),
                     hmac.new(key, msg, hashlib.md5).hexdigest(),
                     round(vals["ncdf"], 6), round(vals["incdf"], 6),
                     round(vals["bcdf"], 6), round(vals["tcdf"], 6)))

    con = duckdb.connect()
    con.execute("""CREATE TABLE t (doc_id BIGINT, word VARCHAR, stem1 VARCHAR,
                   mac VARCHAR, mac_md5 VARCHAR, ncdf DOUBLE, incdf DOUBLE,
                   bcdf DOUBLE, tcdf DOUBLE)""")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?,?,?,?,?)", rows)
    con.execute(f"COPY t TO '{os.path.abspath(OUT)}' (FORMAT PARQUET)")
    print(f"wrote {len(rows)} rows to {OUT}")


if __name__ == "__main__":
    main()
