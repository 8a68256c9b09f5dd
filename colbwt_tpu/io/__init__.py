from colbwt_tpu.io.formats import (  # noqa: F401
    read_fixed_ints,
    write_fixed_ints,
    read_rlbwt,
    write_rlbwt,
    read_col_mums,
    write_col_mums,
    read_thresholds_file,
    write_thresholds_file,
    read_col_ids,
    write_col_ids,
    read_sdsl_bit_vector,
    write_sdsl_bit_vector,
    write_plain_bwt,
    read_plain_bwt,
    write_col_pml_file,
    read_col_pml_file,
)
from colbwt_tpu.io.fasta import read_fasta, write_fasta, FastaRecord  # noqa: F401
from colbwt_tpu.io.pml_out import (  # noqa: F401
    write_pml_cid_text,
    write_pml_cid_binary,
    read_pml_cid_binary,
)
