from pygrametl_spark.plans.keys import assign_dense_keys, max_key  # noqa: F401
