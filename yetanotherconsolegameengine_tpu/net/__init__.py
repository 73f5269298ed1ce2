"""Networked scene replication (the reference's SceneSync layer,
/root/reference/ConsoleGame/RayTracing/Scenes/SyncScene.cs)."""
