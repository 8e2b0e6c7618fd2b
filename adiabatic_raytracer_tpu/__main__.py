from adiabatic_raytracer_tpu.cli import main

raise SystemExit(main())
