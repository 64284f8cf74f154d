from cleanlab_ray.cli import main

raise SystemExit(main())
