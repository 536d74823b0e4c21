"""UT1-style domain-blocklist matching (stages/blocklist.py)."""

import pandas as pd


def _hosts(hosts):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(hosts)), "host": list(hosts)})
    )


def _flags(hosts, blocked):
    from deepcrawl4ai_ray.stages.blocklist import domain_block_flags

    out = domain_block_flags(_hosts(hosts), "host", blocked).to_pandas()
    return dict(zip(out["host"], out["blocked_by"]))


class TestDomainBlockFlags:
    def test_exact_subdomain_and_miss(self, ray_session):
        got = _flags(
            [
                "site3.example",          # exact match
                "www.site3.example",      # subdomain of a blocked domain
                "a.b.site3.example",      # deep subdomain
                "notsite3.example",       # suffix WITHOUT label boundary: kept
                "site4.example",          # kept
                "ads.site5.example",      # exact subdomain entry
                "x.ads.site5.example",    # under the subdomain entry
                "site5.example",          # parent of a blocked subdomain: kept
            ],
            ["site3.example", "ads.site5.example"],
        )
        assert got["site3.example"] == "site3.example"
        assert got["www.site3.example"] == "site3.example"
        assert got["a.b.site3.example"] == "site3.example"
        assert got["notsite3.example"] == ""
        assert got["site4.example"] == ""
        assert got["ads.site5.example"] == "ads.site5.example"
        assert got["x.ads.site5.example"] == "ads.site5.example"
        assert got["site5.example"] == ""

    def test_most_specific_tie_is_lexicographic_min(self, ray_session):
        # both entries match ads.site.example: report the lexicographic
        # min so the SQL MIN(dom) twin agrees
        got = _flags(["ads.site.example"], ["site.example", "ads.site.example"])
        assert got["ads.site.example"] == "ads.site.example"

    def test_case_insensitive_host(self, ray_session):
        # matching is case-insensitive; the host column itself is passed
        # through unmodified
        got = _flags(["WWW.Site3.Example"], ["site3.example"])
        assert got["WWW.Site3.Example"] == "site3.example"

    def test_empty_blocklist_keeps_all(self, ray_session):
        got = _flags(["a.example", "b.example"], [])
        assert set(got.values()) == {""}

    def test_empty_input_keeps_schema(self, ray_session):
        from deepcrawl4ai_ray.stages.blocklist import domain_block_flags

        out = domain_block_flags(_hosts([]), "host", ["x.example"])
        sch = out.schema()
        assert list(sch.names) == ["doc_id", "host", "blocked_by"]
        assert out.count() == 0

    def test_matches_bruteforce_reference_randomized(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(23)
        labels = ["a", "bb", "ccc", "x", "yy"]
        tlds = ["com", "org"]

        def rand_host():
            depth = int(rng.integers(1, 5))
            return ".".join(
                [labels[int(i)] for i in rng.integers(0, len(labels), size=depth)]
                + [tlds[int(rng.integers(0, 2))]]
            )

        hosts = [rand_host() for _ in range(300)]
        blocked = sorted({rand_host() for _ in range(40)})

        def ref_match(h):
            cands = [
                d for d in blocked if h == d or h.endswith("." + d)
            ]
            return min(cands) if cands else ""

        got = _flags(hosts, blocked)
        for h in set(hosts):
            assert got[h] == ref_match(h), h
