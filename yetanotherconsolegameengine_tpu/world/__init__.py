"""World generation & chunk streaming (the reference's L5 layer,
/root/reference/ConsoleGame/RayTracing/Scenes/WorldGeneration/)."""
