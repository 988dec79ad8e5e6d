from vag_nmt_tpu.cli import main

main()
