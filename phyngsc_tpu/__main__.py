from phyngsc_tpu.cli import main

raise SystemExit(main())
