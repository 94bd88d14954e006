import logging

import pyarrow as pa
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level=logging.ERROR,
    )
    yield ray
    ray.shutdown()


@pytest.fixture()
def scalar_mixed() -> pa.Table:
    """The canonical 6-column frame (FIXTURES.md F2; reference
    tests/kamae/spark/conftest.py:50-60)."""
    return pa.table(
        {
            "col1": [1.0, 4.0, 7.0],
            "col2": [2.0, 2.0, 8.0],
            "col3": [3.0, 6.0, 3.0],
            "col4": ["a", "b", "a"],
            "col5": ["c", "c", "a"],
            "col1_col2_col3": [[1.0, 2.0, 3.0], [4.0, 2.0, 6.0], [7.0, 8.0, 3.0]],
        }
    )


@pytest.fixture()
def nested_arrays() -> pa.Table:
    """2-level nesting (FIXTURES.md F3)."""
    return pa.table(
        {
            "col1": [
                [[1.0, 2.0, 3.0], [-4.0, 5.0, -6.0], [7.0, -8.0, 9.0], [1.0, 1.0, 1.0]],
                [[2.0, 2.0, 2.0], [3.0, 3.0, 3.0], [4.0, 4.0, 4.0], [5.0, 5.0, 5.0]],
            ],
        }
    )


@pytest.fixture()
def strings_edge() -> pa.Table:
    """Indexer/hash edge cases (FIXTURES.md F7)."""
    return pa.table(
        {
            "label": ["x", "y", "x", "PAD", None, "x", "y", "zz"],
            "label_arr": [
                ["a", "b", "a"],
                ["PAD", "c"],
                [],
                ["a"],
                None,
                ["b", "b"],
                ["c"],
                ["d"],
            ],
        }
    )
