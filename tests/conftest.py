import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """t1-smoke-sized deterministic pages corpus (FIXTURES.md §1)."""
    from lucene_solr_ray.sources.pages import generate_pages

    out = tmp_path_factory.mktemp("pages")
    paths = generate_pages(str(out), 2000, 2, seed=42)
    return paths


@pytest.fixture(scope="session")
def corpus_queries(small_corpus):
    from lucene_solr_ray.sources.pages import corpus_df_stats, generate_query_set

    dfs = corpus_df_stats(small_corpus)
    return generate_query_set(dfs, seed=42)


@pytest.fixture(scope="session")
def built_indexes(ray_session, small_corpus, tmp_path_factory):
    """P=1 control + P=4 distributed index over the small corpus (shared by
    the search-correctness test modules)."""
    from lucene_solr_ray.pipelines.build import build_index

    base = tmp_path_factory.mktemp("indexes")
    idx1 = str(base / "p1")
    idx4 = str(base / "p4")
    build_index(small_corpus, idx1, num_partitions=1)
    build_index(small_corpus, idx4, num_partitions=4, check_extraction=True)
    return idx1, idx4
