"""User-extension escape hatch, §2.10 of SURVEY.md.

The reference's LambdaFunction applies a user TensorFlow function row-wise via
a UDF shim (reference: src/kamae/spark/transformers/lambda_function.py:341-444).
In Ray Data the natural extension surface IS ``map_batches``, so the Ray
equivalent takes a user **batch** function over pyarrow/numpy data plus a
declared output column set — strictly more general and vectorized (no TF
dependency; see SURVEY.md §2.10 design note).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyarrow as pa

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A


class LambdaFunctionTransformer(Transformer):
    """Apply ``function(*flat_input_arrays) -> pa.Array`` (single output) or
    ``function(batch) -> pa.Table`` (``batch_mode=True``, multi in/out).

    The function must be picklable (module-level def or functools.partial).
    """

    compatible_dtypes = None

    def __init__(
        self,
        *args,
        function: Callable,
        batch_mode: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.function = function
        self.batch_mode = batch_mode

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        if self.batch_mode:
            return self.function(batch)
        cols = [self._cast_in(batch.column(c)) for c in (self.input_cols or [self.input_col])]
        out = A.lift_multi(self.function, cols) if len(cols) > 1 else A.lift(self.function, cols[0])
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)
