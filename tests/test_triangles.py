"""Triangle counting (stages/triangles.py): brute-force equality on
random graphs, K4 / triangle-free shapes, duplicate & self-loop
robustness, block-layout invariance."""

from itertools import combinations

import numpy as np
import pandas as pd


def _ds(df, blocks=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def _brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    return [
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    ]


class TestTriangles:
    def test_k4_plus_isolated_edge(self, ray_session):
        from deepcrawl4ai_ray.stages.triangles import triangle_corner_hosts, triangle_corners

        nodes = [f"https://a.example/{i}" for i in range(4)]
        edges = [(nodes[i], nodes[j]) for i in range(4) for j in range(i + 1, 4)]
        edges += [("https://b.example/1", "https://b.example/2")]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        tri = triangle_corners(_ds(df, 3)).to_pandas()
        assert len(tri) == 4  # C(4,3)
        hosts = triangle_corner_hosts(_ds(df, 3))
        assert hosts.to_dict("records") == [{"host": "a.example", "n_corners": 12}]

    def test_matches_bruteforce_random(self, ray_session):
        from deepcrawl4ai_ray.stages.triangles import triangle_corners

        rng = np.random.default_rng(21)
        n = 40
        edges = [
            (f"https://h{a % 4}.x/{a}", f"https://h{b % 4}.x/{b}")
            for a, b in rng.integers(0, n, size=(400, 2))
            if a != b
        ]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        got = triangle_corners(_ds(df, 7)).to_pandas()
        want = _brute_triangles(edges)
        assert len(got) == len(want)
        # same triangle SET regardless of per-triangle corner order
        got_set = {tuple(sorted(r)) for r in got[["x", "y", "z"]].values.tolist()}
        assert got_set == {tuple(sorted(t)) for t in want}

    def test_triangle_free_and_robustness(self, ray_session):
        from deepcrawl4ai_ray.stages.triangles import triangle_corner_hosts, triangle_corners

        # path graph: no triangles
        path = [(f"https://p.x/{i}", f"https://p.x/{i+1}") for i in range(10)]
        df = pd.DataFrame(path, columns=["src", "dst"])
        assert triangle_corners(_ds(df, 3)).count() == 0
        out = triangle_corner_hosts(_ds(df, 3))
        assert len(out) == 0 and list(out.columns) == ["host", "n_corners"]
        # directed duplicates + self-loops must not change counts
        tri_edges = [("u", "v"), ("v", "w"), ("u", "w")]
        noisy = tri_edges + [(b, a) for a, b in tri_edges] + [("u", "u")] * 3
        df2 = pd.DataFrame(
            [(f"https://t.x/{a}", f"https://t.x/{b}") for a, b in noisy],
            columns=["src", "dst"],
        )
        assert triangle_corners(_ds(df2, 2)).count() == 1

    def test_block_layout_invariant(self, ray_session):
        from deepcrawl4ai_ray.stages.triangles import triangle_corner_hosts

        rng = np.random.default_rng(22)
        edges = [
            (f"https://h{a % 3}.x/{a}", f"https://h{b % 3}.x/{b}")
            for a, b in rng.integers(0, 30, size=(250, 2))
            if a != b
        ]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        one = triangle_corner_hosts(_ds(df, 1))
        many = triangle_corner_hosts(_ds(df, 13))
        pd.testing.assert_frame_equal(one, many)


class TestLocalClustering:
    def test_k4_cc_is_one(self, ray_session):
        from deepcrawl4ai_ray.stages.triangles import local_clustering

        nodes = [f"https://a.x/{i}" for i in range(4)]
        edges = [(nodes[i], nodes[j]) for i in range(4) for j in range(i + 1, 4)]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        out = local_clustering(_ds(df, 2)).to_pandas()
        assert len(out) == 4
        assert (out["degree"] == 3).all()
        assert (out["n_triangles"] == 3).all()
        assert (out["cc"] == 1.0).all()

    def test_matches_bruteforce(self, ray_session):
        from deepcrawl4ai_ray.stages.triangles import local_clustering

        rng = np.random.default_rng(23)
        edges = [
            (f"https://h.x/{a}", f"https://h.x/{b}")
            for a, b in rng.integers(0, 25, size=(180, 2))
            if a != b
        ]
        df = pd.DataFrame(edges, columns=["src", "dst"])
        got = local_clustering(_ds(df, 5)).to_pandas()
        und = {tuple(sorted(e)) for e in edges}
        tris = _brute_triangles(edges)
        tcount: dict = {}
        for t in tris:
            for n in t:
                tcount[n] = tcount.get(n, 0) + 1
        deg: dict = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        for _, row in got.iterrows():
            n = row["node"]
            assert row["n_triangles"] == tcount[n]
            assert row["degree"] == deg[n]
            assert row["cc"] == 2.0 * tcount[n] / (deg[n] * (deg[n] - 1.0))
        assert set(got["node"]) == set(tcount)

    def test_triangle_free_empty(self, ray_session):
        from deepcrawl4ai_ray.stages.triangles import local_clustering

        path = [(f"https://p.x/{i}", f"https://p.x/{i+1}") for i in range(6)]
        ds = local_clustering(_ds(pd.DataFrame(path, columns=["src", "dst"]), 2))
        # Dataset-level contract: zero rows, schema pinned by the seeds.
        # (to_pandas() on a fully-empty map_groups lineage is column-less
        # — a Ray empty-block quirk; pandas edges rebuild the typed frame,
        # cf. pipelines/queries.link_clustering.)
        assert ds.count() == 0
        assert ds.schema().names == ["node", "degree", "n_triangles", "cc"]


class TestIntNodeIds:
    def test_int64_edge_table(self, ray_session):
        """Type-stability regression: an int64 edge table must count the
        same triangles as its string spelling (node ids are cast to
        string inside _canonical_edges, not silently join-mismatched)."""
        import numpy as np

        from deepcrawl4ai_ray.stages.triangles import triangle_corners

        edges_i = pd.DataFrame(
            {"src": np.array([1, 2, 1, 4], dtype=np.int64),
             "dst": np.array([2, 3, 3, 5], dtype=np.int64)}
        )
        got = triangle_corners(_ds(edges_i, 2)).to_pandas()
        assert len(got) == 1
        assert sorted(got.iloc[0].tolist()) == ["1", "2", "3"]
