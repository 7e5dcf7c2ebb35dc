from .spmm_kernel import prepare_spmm, build_segment_plan, gspmm_pallas  # noqa: F401
