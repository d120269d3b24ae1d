/** Jest config (ts-jest), mirroring the reference js/jest.config.js. */
module.exports = {
  preset: "ts-jest",
  testEnvironment: "node",
  testMatch: ["**/tests/**/*.test.ts"],
  transform: {
    "^.+\\.tsx?$": ["ts-jest", { tsconfig: { resolveJsonModule: true, esModuleInterop: true } }],
  },
};
