from .spmm import gspmm, copy_u_sum, u_mul_e_sum  # noqa: F401
from .sddmm import gsddmm  # noqa: F401
from .edge_softmax import edge_softmax  # noqa: F401
from .gat import gat_attention  # noqa: F401
from .pallas.spmm_kernel import prepare_spmm  # noqa: F401
from .rgcn import prepare_rgcn  # noqa: F401
from . import segment  # noqa: F401
