from eigenkernel_tpu.cli import main

raise SystemExit(main())
