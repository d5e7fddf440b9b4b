from .testing import assert_close, get_abs_err, get_err_ratio, tree_assert_close
