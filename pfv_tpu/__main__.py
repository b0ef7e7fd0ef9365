from pfv_tpu.cli import main

main()
